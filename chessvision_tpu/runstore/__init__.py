"""Local run/metrics/table platform — the 3LC replacement.

The reference weaves the proprietary ``tlc`` data platform through
training, evaluation and ingestion (SURVEY.md §2.2, L4): dataset tables
with lineage, per-sample metrics collection, embeddings + 2-D reduction,
sample-weight sampling, and run lifecycle (params, scalar logs, status).
This package reimplements those *capabilities* on open storage — parquet
tables (pyarrow) + JSON sidecars under a local store root — with a small
API shaped for this framework rather than a clone of ``tlc``'s.

Layout on disk:
    <root>/projects/<project>/datasets/<dataset>/<table_name>/
        data.parquet      — columns (object columns JSON-encoded)
        schema.json       — column kinds + lineage (parents, op)
    <root>/projects/<project>/runs/<run_name>/
        params.json       — parameters + status
        scalars.jsonl     — tlc.log equivalent (one JSON per call)
        metrics/<name>.parquet — per-sample metrics tables
        bulk/             — checkpoints and other artifacts
"""

from chessvision_tpu.runstore.runs import NullRun, Run, init
from chessvision_tpu.runstore.tables import Table

__all__ = ["NullRun", "Run", "Table", "init"]
