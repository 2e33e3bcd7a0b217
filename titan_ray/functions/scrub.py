"""Ordered regex PII/toxicity scrub — the value-MUTATING transform.

Analog of the reference's wind-undercatch correction, the one stage that
rewrites `value` instead of only flagging (reference:
functions/windcorr/rr_windcorr.r:199-208 writes corrected value, keeps
rawvalue). Here: `text_scrubbed` is produced from `text` (kept intact) by a
DETERMINISTIC ordered list of regex substitutions, so per-turn scrubbed-text
equality vs the serial oracle is exact (BASELINE.json north_rule).

Patterns are kept RE2-compatible (no lookarounds/backrefs) so the same
pattern strings run identically under DuckDB's regexp_replace for the SQL
oracle (__ray_entry__.oracle_sql).
"""

from __future__ import annotations

import re

# (name, pattern, replacement) — applied IN ORDER. Order matters: e.g. the
# email rule must run before the generic digit rules would mangle domains.
SCRUB_RULES: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("ssn", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "[SSN]"),
    ("credit_card", r"\b[0-9]{4}[ -][0-9]{4}[ -][0-9]{4}[ -][0-9]{4}\b", "[CARD]"),
    # hyphen LAST inside the class = literal ('[ -.]' would be the RANGE
    # 0x20-0x2E and also match !"#$%&'()*+,)
    ("phone", r"(?:\+[0-9]{1,3}[ .-])?\(?[0-9]{3}\)?[ .-][0-9]{3}[ .-][0-9]{4}\b", "[PHONE]"),
    ("ipv4", r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b", "[IP]"),
    ("api_key", r"\b(?:sk|pk|ak)-[A-Za-z0-9]{16,}\b", "[KEY]"),
    # URLs after email (an email's domain must not first become part of a
    # URL match) — RE2-safe class, no lookarounds
    ("url", r"https?://[^\s\"'<>]+", "[URL]"),
)

# Toxicity lexicon (mild placeholder terms — the mechanism, not a full list).
TOXICITY_TERMS: tuple[str, ...] = ("frakking", "shazbot", "gorram", "smegging")
_TOX_PATTERN = r"\b(?:" + "|".join(TOXICITY_TERMS) + r")\b"
SCRUB_RULES = SCRUB_RULES + (("toxicity", _TOX_PATTERN, "[TOX]"),)

# Blacklist terms: rows CONTAINING these are flagged 999 outright
# (reference blacklist semantics, read_data_to_check.r:94-119) — contrast
# with scrub terms, which rewrite but keep the row.
BLACKLIST_TERMS: tuple[str, ...] = ("BLOCKLISTED_TOKEN", "DO_NOT_TRAIN")


class Scrubber:
    """Compile once (per actor), apply vectorized per batch."""

    def __init__(self, rules: tuple[tuple[str, str, str], ...] = SCRUB_RULES):
        self.rules = [(name, re.compile(pat), repl) for name, pat, repl in rules]

    def scrub_one(self, text: str | None) -> str | None:
        if text is None:
            return None
        for _, pat, repl in self.rules:
            text = pat.sub(repl, text)
        return text

    def scrub_pandas(self, series):
        """Apply all rules over a pandas string Series (C-looped re engine)."""
        out = series
        for _, pat, repl in self.rules:
            out = out.str.replace(pat, repl, regex=True)
        return out


def blacklist_mask_pandas(series):
    """Boolean Series: text contains any blacklist term (code 999 analog)."""
    pat = "|".join(re.escape(t) for t in BLACKLIST_TERMS)
    return series.str.contains(pat, regex=True, na=False)
