"""Flag-algebra unit tests (SURVEY.md §2.6): first-flag-wins, keep-list,
doit semantics — the core the reference enforces via its is.na(dqcflag)
guards (reference: metadata_check.r:20, buddy.r:118, isolation.r:23)."""

import numpy as np
import pandas as pd
import pyarrow as pa

from titan_ray.config import QCConfig
from titan_ray.schema import (
    CODE_BLACKLIST,
    CODE_BUDDY,
    CODE_ISOLATION,
    CODE_KEEP,
    CODE_NOMETA,
    CODE_PLAUS,
    CODE_SCT_DUAL,
)
from titan_ray.stages.flags import UNFLAGGED, apply_flag, usable_mask
from titan_ray.stages.flags import testable_mask as tmask
from titan_ray.stages.conv import run_conv_checks
from titan_ray.stages.rowwise import final_decision, metadata_check, plausibility_check, seed_lists


def test_first_flag_wins():
    flags = np.array([UNFLAGGED, 501, UNFLAGGED], dtype=np.int32)
    out = apply_flag(flags, np.array([True, True, False]), 502)
    assert out.tolist() == [502, 501, UNFLAGGED]


def test_keep_overwrite_only_when_allowed():
    flags = np.array([CODE_KEEP, CODE_KEEP], dtype=np.int32)
    assert apply_flag(flags, np.array([True, True]), CODE_NOMETA, flags_keeplisted=True).tolist() == [901, 901]
    assert apply_flag(flags, np.array([True, True]), CODE_BUDDY, flags_keeplisted=False).tolist() == [990, 990]


def test_usable_testable_doit():
    flags = np.array([UNFLAGGED, UNFLAGGED, UNFLAGGED, CODE_KEEP, 501], dtype=np.int32)
    doit = np.array([1, 2, 0, 1, 1], dtype=np.int8)
    assert usable_mask(flags, doit).tolist() == [True, True, False, True, False]
    assert tmask(flags, doit).tolist() == [True, False, False, False, False]


def _mk_batch(texts, keeplist=None):
    n = len(texts)
    return pa.table(
        {
            "conv_id": pa.array([f"c{i}" for i in range(n)]),
            "turn_idx": pa.array(np.zeros(n, dtype=np.int32)),
            "role": pa.array(["user"] * n),
            "text": pa.array(texts, type=pa.string()),
            "tool": pa.array([""] * n),
            "ts": pa.array([0] * n, type=pa.timestamp("us")),
            "is_keeplist": pa.array(keeplist or [False] * n),
        }
    )


def test_seed_then_metadata_order():
    cfg = QCConfig()
    b = _mk_batch(["ok text here", "has BLOCKLISTED_TOKEN", None, ""], keeplist=[False, False, False, True])
    b = seed_lists(b, cfg)
    f = b["dqcflag"].to_pylist()
    assert f == [UNFLAGGED, CODE_BLACKLIST, UNFLAGGED, CODE_KEEP]
    b = metadata_check(b, cfg)
    f = b["dqcflag"].to_pylist()
    # null text -> 901; empty keep-listed row -> metadata MAY flag keep (901)
    assert f == [UNFLAGGED, CODE_BLACKLIST, CODE_NOMETA, CODE_NOMETA]


def test_plausibility_flags_keeplisted():
    cfg = QCConfig()
    b = _mk_batch(["x"], keeplist=[True])
    b = seed_lists(b, cfg)
    b = b.append_column("lang_conf", pa.array([0.05]))
    b = b.append_column("ppl", pa.array([5.0]))
    b = plausibility_check(b, cfg)
    assert b["dqcflag"].to_pylist() == [CODE_PLAUS]


def test_final_decision_keep_codes():
    b = _mk_batch(["a", "b", "c"])
    b = b.set_column(b.column_names.index("is_keeplist"), "is_keeplist", [pa.array([False] * 3)])
    b = b.append_column("dqcflag", pa.array(np.array([UNFLAGGED, CODE_KEEP, 501], dtype=np.int32)))
    out = final_decision(b)
    assert out["dqcflag"].to_pylist() == [0, CODE_KEEP, 501]
    assert out["keep"].to_pylist() == [True, True, False]


# ---------------------------------------------------------------------------
# conversation-local kernel units
# ---------------------------------------------------------------------------

def _conv_df(qs, lang=None, flags=None, roles=None, conv="c0"):
    n = len(qs)
    return pd.DataFrame(
        {
            "conv_key": [f"{conv}#0"] * n,
            "conv_id": [conv] * n,
            "turn_idx": np.arange(n, dtype=np.int64),
            "ts": pd.to_datetime(np.arange(n), unit="s"),
            "role": roles or ["user"] * n,
            "lang": lang or ["en"] * n,
            "qscore": np.asarray(qs, dtype=float),
            "dqcflag": np.asarray(flags if flags is not None else [UNFLAGGED] * n, dtype=np.int32),
            "is_core": [True] * n,
            "bucket": [0] * n,
        }
    )


def test_buddy_flags_local_anomaly():
    qs = [1.7] * 10
    qs[5] = 4.0
    out = run_conv_checks(_conv_df(qs), QCConfig())
    assert out.loc[out.turn_idx == 5, "dqcflag"].iloc[0] == CODE_BUDDY
    assert (out.loc[out.turn_idx != 5, "dqcflag"] == UNFLAGGED).all()


def test_buddy_negative_anomaly():
    qs = [2.0] * 10
    qs[4] = 0.2
    out = run_conv_checks(_conv_df(qs), QCConfig())
    assert out.loc[out.turn_idx == 4, "dqcflag"].iloc[0] == CODE_BUDDY


def test_buddy_respects_keep():
    qs = [1.7] * 10
    qs[5] = 4.0
    flags = [UNFLAGGED] * 10
    flags[5] = CODE_KEEP
    out = run_conv_checks(_conv_df(qs, flags=flags), QCConfig())
    assert out.loc[out.turn_idx == 5, "dqcflag"].iloc[0] == CODE_KEEP


def test_buddy_doit2_used_not_tested():
    cfg = QCConfig(doit={"buddy": {"tool": 2}, "sct": {"tool": 2}})
    qs = [1.7] * 10
    qs[5] = 4.0
    roles = ["user"] * 10
    roles[5] = "tool"
    out = run_conv_checks(_conv_df(qs, roles=roles), cfg)
    assert out.loc[out.turn_idx == 5, "dqcflag"].iloc[0] == UNFLAGGED


def test_buddy_iterates_masking_outliers():
    # two adjacent outliers: first pass flags the bigger, second the smaller
    qs = [1.7] * 12
    qs[5], qs[6] = 5.0, 3.6
    out = run_conv_checks(_conv_df(qs), QCConfig())
    assert out.loc[out.turn_idx.isin([5, 6]), "dqcflag"].tolist() == [CODE_BUDDY, CODE_BUDDY]


def test_dual_minority_event_flagged():
    lang = ["en"] * 11
    lang[4] = "de"
    out = run_conv_checks(_conv_df([1.7] * 11, lang=lang), QCConfig())
    assert out.loc[out.turn_idx == 4, "dqcflag"].iloc[0] == CODE_SCT_DUAL


def test_dual_majority_not_flagged():
    lang = ["de"] * 11  # all non-English: agreement, nothing flagged by dual
    out = run_conv_checks(_conv_df([1.7] * 11, lang=lang), QCConfig())
    assert (out["dqcflag"] == UNFLAGGED).all()


def test_isolation_short_conv():
    out = run_conv_checks(_conv_df([1.7, 1.7]), QCConfig())
    assert (out["dqcflag"] == CODE_ISOLATION).all()


def test_isolation_counts_only_usable():
    flags = [501, 501, UNFLAGGED, 501]  # lone usable row has 0 usable buddies
    out = run_conv_checks(_conv_df([1.7] * 4, flags=flags), QCConfig())
    assert out.loc[out.turn_idx == 2, "dqcflag"].iloc[0] == CODE_ISOLATION


def test_halo_rows_not_flagged_but_used():
    df = _conv_df([1.7] * 10)
    df.loc[5, "qscore"] = 4.0
    df.loc[5, "is_core"] = False  # halo copy: used as buddy, never flagged
    out = run_conv_checks(df, QCConfig())
    assert len(out) == 9  # halo row not emitted
    assert (out["dqcflag"] != CODE_BUDDY).all()


def test_zdem_stated_vs_derived():
    from titan_ray.config import QCConfig as C
    from titan_ray.stages.rowwise import zdem_check, seed_lists
    from titan_ray.schema import CODE_ZDEM
    cfg = C(enable_zdem=True)
    b = _mk_batch(["tool output here", "plain user text", "another tool"])
    b = b.set_column(b.column_names.index("role"), "role", [pa.array(["tool", "user", "user"])])
    b = b.set_column(b.column_names.index("tool"), "tool", [pa.array(["", "", "search"])])
    b = seed_lists(b, cfg)
    out = zdem_check(b, cfg)
    # tool-role without tool name, and tool name without tool role -> 902
    assert out["dqcflag"].to_pylist() == [CODE_ZDEM, UNFLAGGED, CODE_ZDEM]


def test_ccrrt_cross_signal():
    from titan_ray.config import QCConfig as C
    from titan_ray.stages.rowwise import ccrrt_check, seed_lists
    from titan_ray.schema import CODE_CCRRT
    cfg = C(enable_ccrrt=True, ccrrt_tmax=3.0)
    b = _mk_batch(["x", "y"])
    b = b.set_column(b.column_names.index("role"), "role", [pa.array(["tool", "tool"])])
    b = seed_lists(b, cfg)
    b = b.append_column("qscore", pa.array([4.5, 1.5]))
    out = ccrrt_check(b, cfg)
    assert out["dqcflag"].to_pylist() == [CODE_CCRRT, UNFLAGGED]


def test_sct_fg_external_centre():
    from titan_ray.schema import CODE_SCT_FG
    cfg = QCConfig(enable_sct_fg=True, sct_fg_t=4.0,
                   fgt_ref={"user": (1.7, 0.5)})
    qs = [1.7] * 14
    qs[6] = 3.6  # far from the external centre but NOT a local buddy outlier?
    # buddy/sct run first: disable them so sct_fg owns the flag
    cfg.buddy_tpos = cfg.buddy_tneg = 99.0
    cfg.sct_t = 99.0
    out = run_conv_checks(_conv_df(qs), cfg)
    assert out.loc[out.turn_idx == 6, "dqcflag"].iloc[0] == CODE_SCT_FG


def test_dual_fg_external_prior():
    from titan_ray.schema import CODE_DUAL_FG
    cfg = QCConfig(enable_dual_fg=True, dual_fg_prior=0.0)
    lang = ["en"] * 12
    lang[5] = "fr"   # event=1 vs prior 0, neighbourhood agrees with prior
    out = run_conv_checks(_conv_df([1.7] * 12, lang=lang), cfg)
    assert out.loc[out.turn_idx == 5, "dqcflag"].iloc[0] == CODE_DUAL_FG


def test_buddy_priority_first_pass():
    # low-prio outlier is judged against high-prio buddies in pass 1 and
    # flagged; a high-prio row is never compared against low-prio-only sets
    cfg = QCConfig(prio={"user": 1, "assistant": 0})
    qs = [1.7] * 10
    qs[5] = 4.0
    roles = ["user"] * 10
    roles[5] = "assistant"          # low-prio outlier
    out = run_conv_checks(_conv_df(qs, roles=roles), cfg)
    assert out.loc[out.turn_idx == 5, "dqcflag"].iloc[0] == CODE_BUDDY


def test_fgt_ensemble_majority():
    from titan_ray.schema import CODE_FGT
    # 2-member ensemble (thresholds 0.9t/1.1t, majority=1): the looser
    # member catches a deviation the single fgt_t threshold misses
    base = QCConfig(fgt_ref={"user": (1.7, 0.5)}, fgt_t=2.0,
                    buddy_tpos=99.0, buddy_tneg=99.0, sct_t=99.0, dual_thr=1.1)
    qs = [1.7] * 12
    qs[5] = 1.7 + 1.9 * 0.5   # dev/sd = 1.9: > 1.8 (loose member), < 2.0
    single = run_conv_checks(_conv_df(qs), base)
    assert single.loc[single.turn_idx == 5, "dqcflag"].iloc[0] == UNFLAGGED
    ens = QCConfig(**{**base.__dict__, "fgt_ensemble": 2})
    voted = run_conv_checks(_conv_df(qs), ens)
    assert voted.loc[voted.turn_idx == 5, "dqcflag"].iloc[0] == CODE_FGT
