"""doc_bpe_merges: distributed BPE tokenizer training vs (a) a pure-Python
reference implementation of classic Sennrich-style merges and (b) the
unrolled DuckDB recursive-CTE replay."""

import re
from collections import Counter

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _reference_bpe(texts: list[str], k: int) -> list[tuple[int, str, str, int]]:
    """Independent oracle: word-frequency table + greedy left-to-right
    non-overlapping merges, argmax by (count DESC, left ASC, right ASC)."""
    vocab = Counter()
    for t in texts:
        vocab.update(re.findall(r"[a-z]+", t.lower()))
    syms = {w: list(w) for w in vocab}
    out = []
    for r in range(1, k + 1):
        pairs: Counter = Counter()
        for w, c in vocab.items():
            s = syms[w]
            for i in range(len(s) - 1):
                pairs[(s[i], s[i + 1])] += c
        if not pairs:
            break
        (a, b), c = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        out.append((r, a, b, c))
        for w in vocab:
            s = syms[w]
            ns, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    ns.append(a + b)
                    i += 2
                else:
                    ns.append(s[i])
                    i += 1
            syms[w] = ns
    return out


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


CORPUS = [
    "low low low low low lower lower newest newest newest",
    "newest newest newest widest widest widest",
    "aaaa aaaaa aaa aaaa bb-bb CC!cc aaa",   # overlap family + case/punct
    "the quick brown fox jumps over the lazy dog the the the",
    "",                                        # empty doc
    "1234 --- !!!",                            # no alpha words at all
    "singleton",
]


def test_bpe_matches_reference_python(ray_session, tmp_path):
    from titan_ray.stages.bpe import doc_bpe_merges

    sf_dir = _write_docs(tmp_path, CORPUS)
    got = doc_bpe_merges(sf_dir, k=6).to_pydict()
    want = _reference_bpe(CORPUS, 6)
    assert list(zip(got["merge_rank"], got["lhs"], got["rhs"], got["pair_count"])) == want


def test_bpe_sql_oracle(ray_session, tmp_path):
    import duckdb

    from titan_ray.stages.bpe import bpe_sql, doc_bpe_merges
    from tools.check_contract import to_pandas, value_hash

    sf_dir = _write_docs(tmp_path, CORPUS)
    eng = to_pandas(doc_bpe_merges(sf_dir, k=5))
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'")
    ora = con.sql(bpe_sql(k=5)).df()
    assert len(eng) == len(ora) == 5
    assert value_hash(eng) == value_hash(ora)


def test_bpe_partition_invariance(ray_session, tmp_path):
    from titan_ray.stages.bpe import doc_bpe_merges

    sf_dir = _write_docs(tmp_path, CORPUS * 3)
    a = doc_bpe_merges(sf_dir, k=4, num_buckets=16).to_pydict()
    b = doc_bpe_merges(sf_dir, k=4, num_buckets=3).to_pydict()
    assert a == b


def test_bpe_encode_matches_reference_python(ray_session, tmp_path):
    from titan_ray.stages.bpe import doc_bpe_encode

    sf_dir = _write_docs(tmp_path, CORPUS)
    got = doc_bpe_encode(sf_dir, k=6).to_pandas().set_index("doc_id").sort_index()

    merges = _reference_bpe(CORPUS, 6)
    rules = [(a, b) for _, a, b, _ in merges]

    def encode(word):
        s = list(word)
        for a, b in rules:
            ns, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    ns.append(a + b)
                    i += 2
                else:
                    ns.append(s[i])
                    i += 1
            s = ns
        return len(s)

    for doc_id, text in enumerate(CORPUS):
        words = re.findall(r"[a-z]+", text.lower())
        if not words:
            assert doc_id not in got.index  # zero-word docs emit no row
            continue
        assert got.loc[doc_id, "n_words"] == len(words)
        assert got.loc[doc_id, "n_bpe_tokens"] == sum(encode(w) for w in words)


def test_bpe_encode_sql_oracle(ray_session, tmp_path):
    import duckdb

    from titan_ray.stages.bpe import bpe_encode_sql, doc_bpe_encode
    from tools.check_contract import to_pandas, value_hash

    sf_dir = _write_docs(tmp_path, CORPUS)
    eng = to_pandas(doc_bpe_encode(sf_dir, k=5))
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'")
    ora = con.sql(bpe_encode_sql(k=5)).df()
    assert len(eng) == len(ora)
    assert value_hash(eng) == value_hash(ora)


def test_bpe_exhausted_corpus_raises(ray_session, tmp_path):
    from titan_ray.stages.bpe import doc_bpe_merges

    sf_dir = _write_docs(tmp_path, ["ab ab", "cd"])
    with pytest.raises(ValueError, match="exhausted"):
        doc_bpe_merges(sf_dir, k=8)
