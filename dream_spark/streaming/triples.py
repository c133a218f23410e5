"""Streaming triple-store ingestion: N-Triples files land continuously and
the store grows incrementally — the streaming counterpart of the batch
loader in ``sources/ntriples.py`` (the reference rebuilds its RDF-3X
database offline, README.md:36-37; a Spark-native engine can keep the
store open and append).

Design:

- The TRIPLE side is stateless: hash-encoding is row-local (term id =
  ``xxhash64(lexical)``, no coordination), so each micro-batch appends its
  encoded triples with zero streaming state — this path scales to any
  ingest rate.
- The DICTIONARY side needs per-term uniqueness, which a pure append
  stream cannot guarantee; each micro-batch therefore anti-joins its
  distinct new terms against the dictionary-as-of-now before appending.
  The anti join is keyed on the 64-bit id and the batch side is one
  micro-batch's vocabulary — small by construction.  (At warehouse scale
  the dictionary would live in a table format with MERGE semantics; plain
  parquet + anti join gives the same effect with the single-writer
  discipline Structured Streaming's checkpoint already imposes.)
- Exactly-once: the checkpoint makes the SOURCE exactly-once (each file is
  processed in exactly one committed batch); the parquet append itself is
  at-least-once on executor retry within a batch — the standard
  foreachBatch caveat, solved in production by an idempotent (MERGE) sink.

``store()`` reopens the streamed result as a normal ``TripleStore`` —
every query surface (SPARQL, export, analytics) works on it unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.utils import AnalysisException

from dream_spark.sources.ntriples import encode, parse_lines


def ingest_ntriples_stream(
    spark: SparkSession,
    src_path: str,
    triples_path: str,
    dict_path: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Start the ingestion stream: text files under ``src_path`` →
    encoded triples + incrementally-merged dictionary.  Returns the
    StreamingQuery; with ``available_now`` it drains the current file set
    and stops (the test/trigger-batch mode), otherwise it runs
    continuously."""

    def _sink(batch_lines: DataFrame, batch_id: int) -> None:
        # cache the parsed batch: the triples append plus the three-way
        # term union would otherwise re-read and re-parse the source files
        # four times per micro-batch
        parsed = parse_lines(batch_lines).persist()
        try:
            t, d = encode(parsed)
            t.write.mode("append").parquet(triples_path)
            try:
                existing = spark.read.parquet(dict_path).select("id")
            except AnalysisException:  # first batch: no dictionary yet
                # ONLY the missing-path error may skip the anti join — a
                # transient read failure (broad `except`) would append the
                # whole batch vocabulary unfiltered, permanently
                # duplicating dictionary rows and fanning out every later
                # decode join
                existing = None
            new_terms = (
                d if existing is None else d.join(existing, on="id", how="left_anti")
            )
            new_terms.write.mode("append").parquet(dict_path)
        finally:
            parsed.unpersist()

    writer = (
        spark.readStream.text(src_path)
        .writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def store(spark: SparkSession, triples_path: str, dict_path: str):
    """Reopen the streamed store as a TripleStore (dictionary constants
    resolve via lookup — streamed stores have no arithmetic id scheme).

    No driver-side path existence probe: ``os.path.exists`` only answers
    for LOCAL paths and would reject a fully-present s3://hdfs:// store;
    ``spark.read.parquet`` raises its own (filesystem-aware) error for a
    genuinely missing path."""
    from dream_spark.sources.triples import TripleStore

    return TripleStore(
        spark,
        spark.read.parquet(triples_path),
        spark.read.parquet(dict_path),
        resolver=None,
    )
