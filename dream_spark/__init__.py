"""dream_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of CMU-Q/DREAM (distributed RDF/SPARQL engine),
rebuilt Spark-first.

The reference (see SURVEY.md) partitions SPARQL queries over fully-replicated
RDF-3X replicas and hand-rolls MPI comms + hash joins.  This engine keeps the
reference's *semantics* — dictionary-encoded triples, SPARQL-BGP querying,
stats-aware join ordering, bag semantics, empty-result propagation, final
dictionary decode — and delegates execution to Spark/Catalyst/AQE.

Layout:
    sources/    triple store (parquet/derived), dictionary, ingesters
    plans/      SPARQL-BGP parser, translator, statistics store
    operators/  dedup, similarity search, text analysis, multimodal, relational
    functions/  deterministic hashing + vector column helpers
    streaming/  structured-streaming operators over the events stream
    engine.py   user-facing facade: Engine.sparql()/sql()/explain()
"""

from dream_spark.engine import Engine
from dream_spark.session import get_spark

__all__ = ["Engine", "get_spark"]
__version__ = "0.1.0"
