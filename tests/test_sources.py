"""Source-side transforms + scalar functions (SURVEY §2.1/§2.9 rows)."""

import numpy as np
import pyarrow as pa
import pytest

from titan_ray.functions.scalars import boxcox, contingency_metrics
from titan_ray.sources.reader import affine_rescale_qscore, impute_defaults, project_output


def test_boxcox():
    x = np.array([1.0, 4.0])
    assert np.allclose(boxcox(x, 0.5), [(1 - 1) / 0.5, (2 - 1) / 0.5])
    assert np.allclose(boxcox(x, 0.0), np.log(x))


def test_contingency_metrics_perfect_and_mixed():
    m = contingency_metrics([True, False, True], [True, False, True])
    assert m["acc"] == 1.0 and m["pod"] == 1.0 and m["pofa"] == 0.0 and m["f1"] == 1.0
    m = contingency_metrics([True, True, False, False], [True, False, True, False])
    assert m["acc"] == 0.5 and m["pod"] == 0.5 and m["pofa"] == 0.5
    assert 0.0 <= m["ets"] <= 1.0


def _batch():
    return pa.table(
        {
            "conv_id": ["a", "b"],
            "turn_idx": pa.array([0, 1], type=pa.int32()),
            "role": pa.array(["tool", None]),
            "text": ["x", "y"],
            "tool": pa.array([None, "srch"], type=pa.string()),
            "ts": pa.array([0, 1], type=pa.timestamp("us")),
            "qscore": [2.0, 3.0],
        }
    )


def test_affine_rescale_per_role():
    out = affine_rescale_qscore(_batch(), {"tool": (1.0, 2.0)})
    assert out["qscore"].to_pylist() == [5.0, 3.0]  # tool: 1+2*2; other identity


def test_impute_defaults():
    out = impute_defaults(_batch(), role_default="user")
    assert out["role"].to_pylist() == ["tool", "user"]
    assert out["tool"].to_pylist() == ["", "srch"]


def test_project_output_order():
    b = _batch()
    b = b.append_column("dqcflag", pa.array([0, 0], type=pa.int32()))
    b = b.append_column("my_extra", pa.array([1, 2]))
    cols = project_output(b).column_names
    assert cols[:6] == ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    assert cols.index("my_extra") < cols.index("dqcflag")  # extras before derived


def test_asof_and_range_join_kernels(ray_session):
    """Custom join operators (stages/joins.py) vs a hand-computed oracle."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from titan_ray.stages.joins import asof_join, range_join

    left = pd.DataFrame({"k": [1, 1, 2, 3], "t": [10, 20, 5, 7], "lv": [1, 2, 3, 4]})
    right = pd.DataFrame({"k": [1, 1, 2, 9], "t": [8, 15, 9, 1], "rv": [100, 150, 90, 9]})
    l = rd.from_pandas(left).repartition(2)
    r = rd.from_pandas(right).repartition(2)
    out = asof_join(l, r, by="k", on="t", value_cols=("rv",)).to_pandas()
    out = out.sort_values(["k", "t"]).reset_index(drop=True)
    # (1,10)->8/100, (1,20)->15/150, (2,5)->no match (9>5), (3,7)->no right key
    assert out[["k", "t", "r_rv"]].values.tolist() == [[1, 10, 100], [1, 20, 150]]

    pairs = range_join(l, r, by="k", on="t", lo=0, hi=6, right_cols=("rv",)).to_pandas()
    pairs = pairs.sort_values(["k", "t", "r_rv"]).reset_index(drop=True)
    # (1,10): right t in [10,16] -> 15; (1,20): none; (2,5): t in [5,11] -> 9
    assert pairs[["k", "t", "r_rv"]].values.tolist() == [[1, 10, 150], [2, 5, 90]]


def test_read_providers_heterogeneous_union(ray_session, tmp_path):
    """parquet + csv + jsonl providers union into one canonical-schema
    Dataset with identical values (multi-format analog of the reference's
    provider rbind)."""
    import json

    import pandas as pd
    import pyarrow.parquet as pq

    from titan_ray.schema import INPUT_SCHEMA
    from titan_ray.sources.reader import read_providers

    rows = [
        {"conv_id": "c1", "turn_idx": 0, "role": "user", "text": "hello there",
         "tool": "", "ts": "2026-01-01T00:00:00"},
        {"conv_id": "c1", "turn_idx": 1, "role": "assistant", "text": "hi",
         "tool": "", "ts": "2026-01-01T00:00:05"},
        {"conv_id": "c2", "turn_idx": 0, "role": "user", "text": "bye now",
         "tool": "search", "ts": "2026-01-02T10:00:00"},
    ]
    df = pd.DataFrame(rows)
    df["ts"] = pd.to_datetime(df["ts"])
    tbl = pa.Table.from_pandas(df, preserve_index=False).cast(INPUT_SCHEMA)

    pq.write_table(tbl, tmp_path / "prov_a.parquet")
    df.to_csv(tmp_path / "prov_b.csv", index=False)
    with open(tmp_path / "prov_c.jsonl", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")

    ds = read_providers([
        str(tmp_path / "prov_a.parquet"),
        str(tmp_path / "prov_b.csv"),
        str(tmp_path / "prov_c.jsonl"),
    ])
    out = ds.to_pandas()
    assert len(out) == 9
    assert list(out.columns) == [f.name for f in INPUT_SCHEMA]
    # every provider contributed identical values
    key = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    g = out.groupby(key, dropna=False).size()
    assert (g == 3).all()
    assert str(out["ts"].dtype).startswith("datetime64")
    # column-pruned variant: only the projection leaves the readers
    pruned = read_providers(
        [str(tmp_path / "prov_b.csv"), str(tmp_path / "prov_c.jsonl")],
        columns=["conv_id", "text"],
    ).to_pandas()
    assert list(pruned.columns) == ["conv_id", "text"] and len(pruned) == 6


def test_entry_flagship_includes_provider_union(ray_session):
    """The driver-run flagship exercises the heterogeneous-format union:
    CSV + JSONL sidecar turns (provider-prefixed conv ids) flow through the
    full QC battery next to the parquet corpus (round-4 verdict item 10)."""
    import __ray_entry__ as e

    df = e.entry().to_pandas()
    pref = df["conv_id"].fillna("@").str.slice(0, 3)
    for tag in ("pb_", "pc_"):
        sub = df[pref == tag]
        assert len(sub) > 50, tag
        assert sub["ts"].notna().all()          # ISO text -> timestamp cast
        assert (sub["dqcflag"] == 0).sum() > 0  # scored and mostly clean
