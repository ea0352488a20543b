"""sbb_ned_ray — a Ray-Data-native entity disambiguation / record-linkage engine.

A from-scratch rebuild of the *semantics* of qurator-spk/sbb_ned
(candidate blocking → pairwise cross-encoder scoring → decision /
transitive clustering) as streaming ``ray.data.Dataset`` pipelines over
Parquet web-page tables ``(url, warc_ts, html, text, lang)``.

Not a port: the reference's Flask service + multiprocessing JobQueues
(see ``/root/reference/qurator/sbb_ned/models/jobs.py``) are replaced by
Ray Data's streaming executor; its per-process ``initializer`` state
(Annoy index, BERT scorer, sqlite KB) becomes actor-pool stages
(``map_batches(Cls, concurrency=N)``).
"""

from sbb_ned_ray.config import PipelineConfig

__all__ = ["PipelineConfig"]
__version__ = "0.1.0"
