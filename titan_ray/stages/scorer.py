"""Stateful scorer stage — the actor-pool analog of the reference's model
side-inputs (reference: functions/IO/read_fgs.r loads background fields once
and broadcasts via fg_env; here each actor builds the langid table and the
char-LM ONCE in __init__ and scores Arrow batches zero-copy in __call__).

Use: ``ds.map_batches(Scorer, batch_format="pyarrow", batch_size=B,
concurrency=N)``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions import langid
from ..functions.features import compute_core_features
from ..functions.lm import CharLM


class Scorer:
    def __init__(self):
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
