"""``python -m chessvision_tpu.ingest`` — ingestion CLI driver
(reference run_process_pipeline.py)."""

from chessvision_tpu.ingest.pipeline import main

raise SystemExit(main())
