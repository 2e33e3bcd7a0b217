"""Stateless per-batch stages: seeding, metadata, range checks, scrub, final.

Each is a pure function suitable for ``Dataset.map_batches(fn,
batch_format="pyarrow")`` — vectorized, no per-row Python in the hot path.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..config import QCConfig
from ..functions.lut import encode, lut, lut_pair
from ..schema import (
    CODE_BLACKLIST,
    CODE_CLIM,
    CODE_KEEP,
    CODE_NOMETA,
    CODE_PLAUS,
)
from .flags import UNFLAGGED, apply_flag, testable_mask


def _doit_vec(batch: pa.Table, cfg: QCConfig, check: str) -> np.ndarray:
    """Per-row doit values without materializing roles as Python objects:
    the common empty-doit config short-circuits to ones; otherwise one
    dictionary-encode + unique-set lookup (no per-row dict .get)."""
    table = cfg.doit.get(check)
    if not table:
        return np.ones(batch.num_rows, dtype=np.int8)
    codes, uniq = encode(batch["role"])
    return lut(codes, uniq, table, 1, np.int8)


def _get_flags(batch: pa.Table) -> np.ndarray:
    if "dqcflag" in batch.column_names:
        return batch["dqcflag"].to_numpy(zero_copy_only=False).astype(np.int32)
    return np.full(batch.num_rows, UNFLAGGED, dtype=np.int32)


def _set_col(batch: pa.Table, name: str, arr) -> pa.Table:
    if name in batch.column_names:
        return batch.set_column(batch.column_names.index(name), name, [arr])
    return batch.append_column(name, [arr])


def _position_mask(batch: pa.Table, positions: tuple[tuple[str, int], ...]) -> np.ndarray:
    """Rows whose (conv_id, turn_idx) is in the broadcast position set
    (reference: read_data_to_check.r:99-119 — the exact-coordinate
    epsilon-join; positions with null conv_id never match)."""
    keys = pc.binary_join_element_wise(
        pc.coalesce(batch["conv_id"], pa.scalar("\x00")),
        pc.cast(pc.coalesce(batch["turn_idx"], pa.scalar(-(2**31), pa.int32())), pa.string()),
        "#",
    ).to_numpy(zero_copy_only=False)
    wanted = np.asarray([f"{c}#{t}" for c, t in positions], dtype=object)
    return np.isin(keys, wanted)


def seed_lists(batch: pa.Table, cfg: QCConfig) -> pa.Table:
    """Blacklist (999) + keep-list (990) seeding at read — by term regex, by
    position, and by keep column
    (reference: read_data_to_check.r:94-119, codes argparser_qccodes.r:72-80)."""
    flags = _get_flags(batch)
    text = batch["text"]
    black = np.zeros(batch.num_rows, dtype=bool)
    if cfg.blacklist_terms:
        pat = "|".join(re.escape(t) for t in cfg.blacklist_terms)
        hit = pc.fill_null(pc.match_substring_regex(text, pat), False)
        black |= hit.to_numpy(zero_copy_only=False).astype(bool)
    if cfg.positional_blacklist:
        black |= _position_mask(batch, cfg.positional_blacklist)
    flags = apply_flag(flags, black, CODE_BLACKLIST)
    keep = np.zeros(batch.num_rows, dtype=bool)
    if cfg.keeplist_col and cfg.keeplist_col in batch.column_names:
        keep |= pc.fill_null(batch[cfg.keeplist_col], False).to_numpy(zero_copy_only=False).astype(bool)
    if cfg.positional_keeplist:
        keep |= _position_mask(batch, cfg.positional_keeplist)
    flags = apply_flag(flags, keep, CODE_KEEP)
    return _set_col(batch, "dqcflag", pa.array(flags, type=pa.int32()))


def metadata_check(batch: pa.Table, cfg: QCConfig) -> pa.Table:
    """Code 901: null/empty text, null conv_id, negative turn_idx, length out
    of [min_chars, max_chars] (reference: metadata_check.r:20-34; may flag
    keep-listed rows, titan.r:191)."""
    flags = _get_flags(batch)
    text = batch["text"]
    n_bytes = pc.coalesce(pc.binary_length(text), pa.scalar(0))
    bad = pc.or_(
        pc.or_(pc.is_null(text), pc.is_null(batch["conv_id"])),
        pc.or_(
            pc.less(batch["turn_idx"], 0),
            pc.or_(pc.less(n_bytes, cfg.min_chars), pc.greater(n_bytes, cfg.max_chars)),
        ),
    )
    bad_np = pc.fill_null(bad, True).to_numpy(zero_copy_only=False).astype(bool)
    flags = apply_flag(flags, bad_np, CODE_NOMETA, flags_keeplisted=True)
    return _set_col(batch, "dqcflag", pa.array(flags, type=pa.int32()))


def plausibility_check(batch: pa.Table, cfg: QCConfig) -> pa.Table:
    """Code 501: lang_conf below threshold or perplexity absurdly high —
    the reference's vmin/vmax range check (plausibility_test.r:7-11).
    May flag keep-listed rows (titan.r:194)."""
    flags = _get_flags(batch)
    doit = _doit_vec(batch, cfg, "plausibility")
    conf = batch["lang_conf"].to_numpy(zero_copy_only=False)
    ppl = batch["ppl"].to_numpy(zero_copy_only=False)
    bad = (conf < cfg.conf_min) | (ppl > cfg.ppl_hard_max)
    open_keep = (flags == UNFLAGGED) | (flags == CODE_KEEP)
    mask = bad & (doit == 1) & open_keep
    flags = apply_flag(flags, mask, CODE_PLAUS, flags_keeplisted=True)
    return _set_col(batch, "dqcflag", pa.array(flags, type=pa.int32()))


def climatological_check(batch: pa.Table, cfg: QCConfig) -> pa.Table:
    """Code 502: perplexity outside the per-language band — the analog of
    month-indexed climatological min/max (climatological_check.r:24-28).
    Cannot flag keep-listed rows."""
    flags = _get_flags(batch)
    doit = _doit_vec(batch, cfg, "climatological")
    lcodes, luniq = encode(batch["lang"], fill="und")
    ppl = batch["ppl"].to_numpy(zero_copy_only=False)
    default = cfg.clim_bands.get("und", (0.0, float("inf")))
    los, his = lut_pair(lcodes, luniq, cfg.clim_bands, default)
    bad = (ppl < los) | (ppl > his)
    flags = apply_flag(flags, bad & testable_mask(flags, doit), CODE_CLIM)
    return _set_col(batch, "dqcflag", pa.array(flags, type=pa.int32()))


def final_decision(batch: pa.Table) -> pa.Table:
    """NA->0 plus keep flag (reference: final_decision.r:9; keep-listed rows
    survive with their 990 marker)."""
    flags = _get_flags(batch)
    flags = np.where(flags == UNFLAGGED, np.int32(0), flags)
    keep = (flags == 0) | (flags == CODE_KEEP)
    batch = _set_col(batch, "dqcflag", pa.array(flags, type=pa.int32()))
    return _set_col(batch, "keep", pa.array(keep))


def zdem_check(batch: pa.Table, cfg: QCConfig) -> pa.Table:
    """Code 902 (optional; reference: check_z_against_dem.r:20-24 — stated
    elevation vs DEM-derived). Transcript analog: stated role/tool metadata
    must agree — role=='tool' iff a tool name is present."""
    from ..schema import CODE_ZDEM

    if not cfg.enable_zdem:
        return batch
    flags = _get_flags(batch)
    doit = _doit_vec(batch, cfg, "zdem")
    is_tool = pc.fill_null(pc.equal(batch["role"], "tool"), False).to_numpy(zero_copy_only=False).astype(bool)
    has_tool = pc.fill_null(pc.not_equal(batch["tool"], ""), False).to_numpy(zero_copy_only=False).astype(bool)
    bad = is_tool != has_tool
    flags = apply_flag(flags, bad & testable_mask(flags, doit), CODE_ZDEM)
    return _set_col(batch, "dqcflag", pa.array(flags, type=pa.int32()))


def ccrrt_check(batch: pa.Table, cfg: QCConfig) -> pa.Table:
    """Code 301 (optional; reference: ccrrt.r:91-96 — cross-variable check
    against an external field). Analog: tool-output turns whose LM qscore
    says 'free prose' (> ccrrt_tmax) contradict their structured role."""
    from ..schema import CODE_CCRRT

    if not cfg.enable_ccrrt:
        return batch
    flags = _get_flags(batch)
    doit = _doit_vec(batch, cfg, "ccrrt")
    q = batch["qscore"].to_numpy(zero_copy_only=False)
    is_tool = pc.fill_null(pc.equal(batch["role"], "tool"), False).to_numpy(zero_copy_only=False).astype(bool)
    bad = is_tool & (q > cfg.ccrrt_tmax)
    flags = apply_flag(flags, bad & testable_mask(flags, doit), CODE_CCRRT)
    return _set_col(batch, "dqcflag", pa.array(flags, type=pa.int32()))
