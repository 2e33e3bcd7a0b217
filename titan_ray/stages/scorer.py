"""Stateful scorer stage — the actor-pool analog of the reference's model
side-inputs (reference: functions/IO/read_fgs.r loads background fields once
and broadcasts via fg_env; here the langid table and the char-LM are built
ONCE, ray.put into the object store, and every actor maps the SAME physical
copy zero-copy in __init__ — one copy per NODE, not per worker).

Why share: the scorer is bandwidth-bound (random gathers over ~6 MB of
log-prob tables per text byte). With a private copy per worker, 32 workers
carry ~190 MB of duplicate tables and every gather misses to DRAM; one
node-shared copy stays L3-resident, which is also the only layout that makes
sense on a real multi-node cluster (plasma is per-node shared memory).

Use: ``ds.map_batches(Scorer, fn_constructor_kwargs={"model_refs":
shared_model_refs()}, batch_format="pyarrow", batch_size=B, concurrency=N)``.
Standalone (no Ray / unit tests): ``Scorer()`` trains private models.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions import langid
from ..functions.features import compute_core_features
from ..functions.lm import CharLM, default_lm, set_default_lm

# (job_id, ObjectRef) — re-put when a new ray session (job) starts in this
# process, so a stale ref from a shut-down session is never handed out
_MODEL_REFS: tuple[str, object] | None = None


def shared_model_refs():
    """ray.put the scorer model tables once per driver session and return
    the ref; None when Ray is not initialized (caller falls back to
    per-actor builds)."""
    global _MODEL_REFS
    try:
        import ray

        if not ray.is_initialized():
            return None
        key = ray.get_runtime_context().get_job_id()
        if _MODEL_REFS is None or _MODEL_REFS[0] != key:
            lm = default_lm()
            _MODEL_REFS = (key, ray.put((lm.tables(), langid.table())))
        return _MODEL_REFS[1]
    except Exception:
        return None


class Scorer:
    def __init__(self, model_refs=None):
        if model_refs is not None:
            import ray

            payload = ray.get(model_refs) if isinstance(model_refs, ray.ObjectRef) else model_refs
            lm_tables, lang_tab = payload
            self.lm = CharLM.from_tables(*lm_tables)
            # install the shared views as this worker's module state so every
            # code path (detect(), default_lm()) reads the node-shared copy
            langid.set_table(lang_tab)
            set_default_lm(self.lm)
        else:
            # once per actor: train/load models, warm the hashed tables
            self.lm = CharLM()
            langid.table()

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = compute_core_features(batch["text"], lm=self.lm)
        qscore = np.log1p(feats["ppl"])
        cols = {
            "lang": pa.array(list(feats["lang"]), type=pa.string()),
            "lang_conf": pa.array(feats["lang_conf"], type=pa.float64()),
            "ppl": pa.array(feats["ppl"], type=pa.float64()),
            "qscore": pa.array(qscore, type=pa.float64()),
            "n_chars": pa.array(feats["n_chars"], type=pa.int32()),
            "n_words": pa.array(feats["n_words"], type=pa.int32()),
            "rep_ratio": pa.array(feats["rep_ratio"], type=pa.float64()),
        }
        for name, arr in cols.items():
            if name in batch.column_names:
                batch = batch.set_column(batch.column_names.index(name), name, [arr])
            else:
                batch = batch.append_column(name, [arr])
        return batch
