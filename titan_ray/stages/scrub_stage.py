"""PII/toxicity scrub stage (value-mutating; reference: rr_windcorr.r:199-208
keeps rawvalue and writes the corrected value — here `text` is kept and
`text_scrubbed` is emitted). Applied to every surviving row; dropped rows get
text_scrubbed = text untouched (they are filtered by `keep` downstream).

Vectorized via pyarrow re2 (byte-identical to the oracle's Python-re path for
these patterns — verified on the full corpus; patterns avoid lookarounds and
backrefs so re2 and re agree).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..functions.scrub import SCRUB_RULES


class ScrubStage:
    def __init__(self, rules=SCRUB_RULES):
        self.rules = [(pat, repl) for _name, pat, repl in rules]

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = batch["text"]
        for pat, repl in self.rules:
            out = pc.replace_substring_regex(out, pat, repl)
        if isinstance(out, pa.ChunkedArray):
            out = out.combine_chunks()
        if "text_scrubbed" in batch.column_names:
            return batch.set_column(batch.column_names.index("text_scrubbed"), "text_scrubbed", [out])
        return batch.append_column("text_scrubbed", [out])
