"""Canonical schemas and flag codes for the transcript QC engine.

Data model per SURVEY.md §1.2 / FIXTURES.md §2: one logical Parquet table of
multi-turn conversation / agent transcripts. Flag codes mirror the reference's
QC codes (reference: functions/IO/argparser_qccodes.r) so the flag algebra is
directly comparable.
"""

from __future__ import annotations

import pyarrow as pa

# ---------------------------------------------------------------------------
# Input schema (BASELINE.json:input_hint)
# ---------------------------------------------------------------------------

INPUT_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
    ]
)

# Derived / emitted columns (SURVEY.md §1.2)
SCORE_COLUMNS = [
    ("lang", pa.string()),
    ("lang_conf", pa.float64()),
    ("ppl", pa.float64()),
    ("n_chars", pa.int32()),
    ("n_words", pa.int32()),
    ("rep_ratio", pa.float64()),
]

OUTPUT_COLUMNS = [
    ("dqcflag", pa.int32()),
    ("keep", pa.bool_()),
    ("text_scrubbed", pa.string()),
    ("sctpog", pa.float64()),
]

ROLES = ("user", "assistant", "system", "tool")

# ---------------------------------------------------------------------------
# Flag codes — numerically identical to the reference's QC codes
# (reference: functions/IO/argparser_qccodes.r:3-80) so that the per-check
# parity mapping in SURVEY.md §2.6 is one-to-one.
# ---------------------------------------------------------------------------

CODE_GOOD = 0            # final_decision: still-unflagged rows are good
CODE_SCT = 1             # SCT local-trend consistency (sct_resistant analog)
CODE_SCT_FG = 2          # SCT vs external first-guess background (sct_fg analog)
CODE_SCT_DUAL = 3        # dichotomous-event consistency (sct_dual analog)
CODE_DUAL_FG = 4         # dichotomous check vs external prior (sct_fg_dual analog)
CODE_BUDDY = 10          # conversation-local buddy check
CODE_FGT = 11            # first-guess (reference-expectation) test
CODE_CCRRT = 301         # cross-signal check (ccrrt analog)
CODE_PLAUS = 501         # plausibility: lang_conf out of band
CODE_CLIM = 502          # climatological: ppl out of context-dependent band
CODE_ISOLATION = 800     # too few usable buddies
CODE_NOMETA = 901        # metadata check
CODE_ZDEM = 902          # stated-vs-derived metadata (dem analog)
CODE_BLACKLIST = 999     # blacklist membership
CODE_KEEP = 990          # keep-list: used as buddy, survives most checks

# Fixed check order (reference: titan.r:115-263, first-flag-wins)
CHECK_ORDER = (
    "blacklist",      # seeded at read (read_data_to_check.r:94-119)
    "keeplist",
    "metadata",       # titan.r:121
    "plausibility",   # titan.r:194
    "climatological", # titan.r:202
    "sct_dual",       # titan.r:215
    "fgt",            # titan.r:222
    "buddy",          # titan.r:232
    "sct",            # titan.r:247
    "isolation",      # titan.r:255
    "final",          # titan.r:263
)

# Checks that MAY flag keep-listed (990) rows (reference: titan.r:191-194 —
# metadata and plausibility include keep-listed rows in their selection).
FLAGS_KEEPLISTED = {"metadata", "plausibility"}


def narrow_strings(tbl: pa.Table) -> pa.Table:
    """Cast any large_string columns down to string (32-bit offsets).

    Some block producers — notably Ray's polars-backed sort
    (DataContext.use_polars_sort) — emit large_string columns; several of
    our Arrow kernels (binary_join_element_wise rank builds, re2 scrubs)
    have no mixed (large_string, string) kernels. Per-batch data is far
    below the 2 GiB offset limit, so the narrow cast is always safe here."""
    import pyarrow.compute as pc

    for i, field in enumerate(tbl.schema):
        if pa.types.is_large_string(field.type):
            tbl = tbl.set_column(i, field.name, pc.cast(tbl.column(i), pa.string()))
    return tbl
