"""First-flag-wins flag algebra (SURVEY.md §2.6).

The reference guards every check with ``which(is.na(dqcflag) | dqcflag ==
code.keep)`` (reference: functions/checks/metadata_check.r:20,
buddy.r:118, isolation.r:23) so the FIRST failing check owns the row.
Internally we use -1 for "not yet flagged" (NA analog); final_decision maps
-1 -> 0 (reference: functions/misc/final_decision.r:9).
"""

from __future__ import annotations

import numpy as np

from ..schema import CODE_KEEP

UNFLAGGED = -1


def apply_flag(flags: np.ndarray, mask: np.ndarray, code: int, flags_keeplisted: bool = False) -> np.ndarray:
    """Set ``code`` where ``mask`` and the row is still unflagged.

    ``flags_keeplisted``: metadata/plausibility may overwrite keep-list 990
    (reference: titan.r:191-194 — those two checks include keep-listed rows).
    """
    open_rows = flags == UNFLAGGED
    if flags_keeplisted:
        open_rows = open_rows | (flags == CODE_KEEP)
    return np.where(open_rows & mask, np.int32(code), flags)


def usable_mask(flags: np.ndarray, doit: np.ndarray) -> np.ndarray:
    """Rows usable as buddies: unflagged or keep-listed, doit in {1,2}
    (reference: sct_resistant.r:130 includes code.keep in the usable set)."""
    return ((flags == UNFLAGGED) | (flags == CODE_KEEP)) & (doit >= 1)


def testable_mask(flags: np.ndarray, doit: np.ndarray) -> np.ndarray:
    """Rows a check may flag: still unflagged and doit == 1
    (reference: buddy.r:121,174 — flag only where doit==1)."""
    return (flags == UNFLAGGED) & (doit == 1)
