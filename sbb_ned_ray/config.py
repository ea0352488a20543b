"""Pipeline configuration.

Mirrors the reference's per-language JSON configs
(``/root/reference/qurator/sbb_ned/webapp/de-config.json:1-37``) plus
request-level overrides (``webapp/app.py:355-365``), expressed as one
dataclass consumed by every pipeline builder.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class PipelineConfig:
    # --- candidate generation (reference: SEARCH_K / MAX_DIST / MAX_CANDIDATES,
    # webapp/de-config.json:24-33; defaults in index.py:652) ---
    max_dist: float = 0.25          # max part-embedding distance for an ANN hit
    max_candidates: int = 25        # top-k candidates kept per mention
    max_frequency: int = 1000       # blocking-key frequency stoplist for short parts
    min_part_len_for_freq: int = 4  # parts shorter than this get the stoplist (index.py:669-674)

    # --- pair building (reference: MAX_PAIRS, models/sentence_lookup.py:25-31) ---
    max_pairs: int = 50             # pair budget per (mention, candidate)

    # --- scoring / decision (reference: DECISION_THRESHOLD, webapp/de-config.json:34) ---
    threshold: float = 0.1          # min proba_1 to accept a link
    max_seq_len: int = 128          # token window for the cross-encoder
    # context window the stub scorer reads around the mention span —
    # analog of the reference's EmbedWithContext w_size
    # (embeddings/base.py:207-352); None = whole sentence.  Bounded
    # windows stop co-mentioned entities' context leaking into the
    # overlap in multi-mention sentences; the BACKWARD window is
    # shorter because evidence in running text overwhelmingly FOLLOWS
    # the mention (appositive pattern) while the tokens just before it
    # belong to the previous clause/mention.
    scorer_context_window: int | None = 6
    scorer_context_back: int = 2

    # --- MinHash-LSH blocking (new; north_star requires char-ngram LSH buckets) ---
    ngram_size: int = 3
    num_perm: int = 32              # minhash permutations
    lsh_bands: int = 8              # bands (rows per band = num_perm // lsh_bands)

    # --- execution sizing ---
    batch_size: int = 256           # pages per batch for cpu stages (fat html
                                    # rows; small batches keep the actor pool fed)
    scorer_batch_size: int = 4096   # pairs per scorer batch (reference GPU BATCH_SIZE analog)
    cpu_concurrency: int | None = None   # actor-pool size; None → let Ray autoscale tasks
    scorer_concurrency: int = 4
    # GPU slot for the cross-encoder pool (split_scorer deployment):
    # passed as num_gpus to the scorer's map_batches — e.g. 1.0 for one
    # GPU per scorer actor, 0.5 to pack two actors per GPU
    scorer_num_gpus: float = 0.0
    decide_partitions: int = 64     # hash buckets for the mention_key decide shuffle
    read_num_blocks: int | None = None   # override read parallelism; None → auto
    # local pre-shuffle pruning: keep only the top-k candidates per mention
    # (after the decide keep-predicate) in the fused worker.  EXACT for
    # ranks < k because a mention's candidates are always batch-local;
    # None emits the full ranked list (reference MAX_CANDIDATES shape).
    emit_top_k: int | None = 5
    # run the per-mention decision inside the fused task (no shuffle);
    # exact for the same batch-locality reason — False restores the
    # groupby(mention_key) exchange (required when mentions may span
    # batches, e.g. externally-supplied mention Datasets)
    local_decide: bool = True

    # --- per-job context (reference request `__CONTEXT__`,
    # webapp/app.py:373-375 / index.py:75-197): keys
    #   "geographic": [qid, ...]        geo re-rank for LOC/ORG mentions
    #   "time": {"not_after_year": y | "birth_not_after_year": y |
    #            "not_after_datetime": iso}   date exclusion filters
    context: dict | None = field(default=None, compare=False, hash=False)

    # pickled decider-model artifact (models/decider_model.save_decider);
    # None → proba_1 = p1_max (the stub-calibrated identity).  A path,
    # not a ref: must be reachable from every worker (shared storage on
    # a real cluster)
    decider_model_path: str | None = None

    # --- misc ---
    seed: int = 42
    languages: tuple[str, ...] = ("de", "en")
    extra: dict = field(default_factory=dict, compare=False, hash=False)

    @property
    def lsh_rows_per_band(self) -> int:
        return self.num_perm // self.lsh_bands


DEFAULT_CONFIG = PipelineConfig()
