"""PII/toxicity scrub stage (value-mutating; reference: rr_windcorr.r:199-208
keeps rawvalue and writes the corrected value — here `text` is kept and
`text_scrubbed` is emitted). Applied to every surviving row; dropped rows get
text_scrubbed = text untouched (they are filtered by `keep` downstream).

Actor pool: regexes compile once per actor in __init__.
"""

from __future__ import annotations

import pyarrow as pa

from ..functions.scrub import SCRUB_RULES, Scrubber


class ScrubStage:
    def __init__(self, rules=SCRUB_RULES):
        self.scrubber = Scrubber(rules)

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pandas as pd

        text = batch["text"].to_pandas()
        scrubbed = self.scrubber.scrub_pandas(text.astype("string"))
        arr = pa.Array.from_pandas(scrubbed, type=pa.string())
        if "text_scrubbed" in batch.column_names:
            return batch.set_column(batch.column_names.index("text_scrubbed"), "text_scrubbed", [arr])
        return batch.append_column("text_scrubbed", [arr])
