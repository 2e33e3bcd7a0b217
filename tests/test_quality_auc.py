"""doc_quality_auc: exact distributed midrank ROC-AUC (classifier logit vs
Gopher labels) vs a brute-force pair count and the DuckDB window replay."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _write_docs(tmp_path, texts):
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), type=pa.int64()),
            "text": pa.array(texts, type=pa.string()),
            "lang": pa.array(["en"] * len(texts), type=pa.string()),
        }
    )
    pq.write_table(tbl, tmp_path / "documents.parquet")
    return str(tmp_path)


def _mixed_corpus():
    """Texts spanning both Gopher verdicts and a spread of logits,
    including deliberate score ties (repeated identical docs)."""
    rng = np.random.default_rng(11)
    words = ["the", "and", "model", "data", "pipeline", "quality", "with",
             "filter", "training", "corpus", "batch", "arrow", "shuffle"]
    texts = []
    for i in range(60):
        n = int(rng.integers(3, 80))
        texts.append(" ".join(rng.choice(words, n)))
    texts += ["zz qq xx"] * 4                # short, fails rules, tied scores
    texts += [texts[0]] * 3                  # exact repeats -> tied scores
    return texts


def test_quality_auc_matches_brute_force(ray_session, tmp_path):
    from titan_ray.functions import classifier
    from titan_ray.pipelines.docqc import AUC_SCALE, doc_quality_auc, gopher_rule_arrays
    from titan_ray.stages.ann import round_half_away

    texts = _mixed_corpus()
    sf_dir = _write_docs(tmp_path, texts)
    got = doc_quality_auc(sf_dir).to_pydict()

    arr = pa.array(texts, type=pa.string())
    s = np.rint(round_half_away(classifier.logits(arr), 6) * AUC_SCALE).astype(np.int64)
    keep = gopher_rule_arrays(arr)[3]
    pos_s, neg_s = s[keep == 1], s[keep == 0]
    assert len(pos_s) and len(neg_s), "fixture must produce both classes"
    num2 = sum(2 * int((p > neg_s).sum()) + int((p == neg_s).sum()) for p in pos_s)
    assert got["n_pos"][0] == len(pos_s) and got["n_neg"][0] == len(neg_s)
    assert got["auc_num2_hi"][0] * 10**18 + got["auc_num2_lo"][0] == num2
    assert got["auc"][0] == round(num2 / float(2 * len(pos_s) * len(neg_s)), 6)


def test_quality_auc_sql_oracle(ray_session, tmp_path):
    import duckdb

    from titan_ray.pipelines.docqc import doc_quality_auc, quality_auc_sql
    from tools.check_contract import to_pandas, value_hash

    sf_dir = _write_docs(tmp_path, _mixed_corpus())
    eng = to_pandas(doc_quality_auc(sf_dir))
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'")
    ora = con.sql(quality_auc_sql()).df()
    assert len(eng) == len(ora) == 1
    assert value_hash(eng) == value_hash(ora)


def test_quality_auc_single_class_null(ray_session, tmp_path):
    from titan_ray.pipelines.docqc import doc_quality_auc

    sf_dir = _write_docs(tmp_path, ["zz qq"] * 5)   # all fail the rules
    got = doc_quality_auc(sf_dir).to_pydict()
    assert got["n_pos"][0] == 0 and got["n_neg"][0] == 5
    assert got["auc"][0] is None
