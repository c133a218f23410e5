from dream_spark.sources.tables import TPCH_TABLES, register_tables
from dream_spark.sources.triples import DICT_SQL, TRIPLES_SQL, TripleStore

__all__ = ["TPCH_TABLES", "register_tables", "TRIPLES_SQL", "DICT_SQL", "TripleStore"]
