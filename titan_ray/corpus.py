"""Deterministic synthetic transcript corpus with planted, labeled defects.

Engine analog of the reference's fixture generators
(reference: test/aux/create_observation_test_ta_files.r:40-68 — sample
stations, plant a labeled fraction of gross errors, write labeled rows).
Here: conversations of templated English turns with per-class planted
violations and `ge_*` label columns per FIXTURES.md §2. Seeded => identical
bytes every run; no external data.

Scale: ``n_turns ≈ 6_000_000 × sf`` (sf0.1 => ~600k-turn bench corpus,
matching the driver lineitem row scale).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .functions._seed_text import SEED_CORPORA

# Template vocabulary — words drawn from the English seed corpus so the
# char-LM assigns clean turns low perplexity.
_ADJ = "quick brown lazy quiet mild light scattered good simple hard honest careful small large wet best".split()
_NOUN = (
    "fox dog hills children school river stories weather wind clouds window "
    "house system design case data records memory committee budget year "
    "project coffee bread butter roads rain history changes morning sun "
    "model score input algorithm entries"
).split()
_VERB = "jumps walks talks keeps streams meets returns teaches handles reads closes explains orders makes".split()
_TAIL = [
    "near the river", "behind the quiet hills", "in the morning",
    "after the rain", "for the next year", "with a light wind",
    "before the meeting", "along the road", "at the school",
    "over the simple case", "with careful measurement", "during the day",
]

GE_COLUMNS = (
    "ge_meta", "ge_range", "ge_buddy", "ge_dual", "ge_iso", "ge_black",
    "ge_pii", "ge_dup", "ge_zdem",
)

# generator version, embedded in the corpus _SUCCESS marker: bumping it
# invalidates every cached corpus AND (via corpus_fingerprint) the scored
# parquet + LSH candidate caches derived from it.
# v2: ge_zdem plants (role/tool metadata mismatches for check 902).
CORPUS_GEN = "v2"

MEGA_CONV_ID = "c_mega0000"


def _sentence_pool(rng: np.random.Generator, size: int) -> np.ndarray:
    a1 = rng.integers(0, len(_ADJ), size)
    n1 = rng.integers(0, len(_NOUN), size)
    v = rng.integers(0, len(_VERB), size)
    a2 = rng.integers(0, len(_ADJ), size)
    n2 = rng.integers(0, len(_NOUN), size)
    t = rng.integers(0, len(_TAIL), size)
    return np.asarray(
        [
            f"The {_ADJ[a1[i]]} {_NOUN[n1[i]]} {_VERB[v[i]]} the {_ADJ[a2[i]]} {_NOUN[n2[i]]} {_TAIL[t[i]]}."
            for i in range(size)
        ],
        dtype=object,
    )


def _noise(rng: np.random.Generator, n_chars: int) -> str:
    letters = np.asarray(list("qwzxjkvbfpg hmtrn"), dtype=object)
    return "".join(letters[rng.integers(0, len(letters), n_chars)])


def _foreign_sentences(lang: str) -> list[str]:
    out, cur = [], []
    for part in SEED_CORPORA[lang].split(". "):
        p = part.strip()
        if len(p) > 30:
            out.append(p if p.endswith((".", "?", "。")) else p + ".")
    return out


def generate_corpus(n_turns: int, seed: int = 42, mega: bool = True) -> pa.Table:
    """Build the labeled transcript table (sorted by conv_id, turn_idx)."""
    rng = np.random.default_rng(seed)
    pool = _sentence_pool(rng, 50_000)

    # --- conversation skeleton -------------------------------------------
    avg_len = 12.0
    n_conv = max(4, int(n_turns / avg_len))
    lengths = np.clip(rng.geometric(1.0 / avg_len, n_conv), 4, 40)
    # isolation plants: ~2% of conversations are too short to have buddies
    iso_conv = rng.random(n_conv) < 0.02
    lengths[iso_conv] = rng.integers(1, 3, int(iso_conv.sum()))
    conv_ids = np.asarray([f"c{i:08d}" for i in range(n_conv)], dtype=object)

    if mega:
        mega_len = int(min(20_000, max(1_600, n_turns // 20)))
        lengths = np.concatenate([lengths, [mega_len]])
        iso_conv = np.concatenate([iso_conv, [False]])
        conv_ids = np.concatenate([conv_ids, [MEGA_CONV_ID]])
        n_conv += 1

    total = int(lengths.sum())
    conv_row = np.repeat(np.arange(n_conv), lengths)
    conv_id = conv_ids[conv_row]
    turn_idx = np.concatenate([np.arange(l) for l in lengths]).astype(np.int32)

    # roles: alternate user/assistant; some convs open with system; ~6% tool
    role = np.where(turn_idx % 2 == 0, "user", "assistant").astype(object)
    sys_conv = rng.random(n_conv) < 0.10
    role[sys_conv[conv_row] & (turn_idx == 0)] = "system"
    tool_rows = (rng.random(total) < 0.06) & (role == "assistant")
    role[tool_rows] = "tool"
    tool = np.where(tool_rows, "search_tool", "").astype(object)

    base = np.datetime64("2025-01-01T00:00:00", "us")
    conv_start = rng.integers(0, 86_400_000_000 * 30, n_conv)  # µs within 30 days
    ts = base + (conv_start[conv_row] + turn_idx.astype(np.int64) * 7_000_000).astype("timedelta64[us]")

    # clean text: 3 sentences from the pool
    sent = rng.integers(0, len(pool), (total, 3))
    text = np.asarray(
        [f"{pool[sent[i, 0]]} {pool[sent[i, 1]]} {pool[sent[i, 2]]}" for i in range(total)],
        dtype=object,
    )

    labels = {c: np.zeros(total, dtype=bool) for c in GE_COLUMNS}
    is_keeplist = np.zeros(total, dtype=bool)
    labels["ge_iso"][iso_conv[conv_row]] = True

    # --- plant picker: mutually exclusive corrupted rows ------------------
    eligible = ~iso_conv[conv_row] & (turn_idx >= 2) & (turn_idx < lengths[conv_row] - 2)
    order = rng.permutation(np.flatnonzero(eligible))
    cursor = 0

    def take(frac: float) -> np.ndarray:
        nonlocal cursor
        k = max(2, int(total * frac)) if total >= 50 else 1
        sel = order[cursor : cursor + k]
        cursor += k
        return sel

    # ge_meta (901): empty text / null text / negative turn_idx / null conv_id
    meta_rows = take(0.01)
    labels["ge_meta"][meta_rows] = True
    null_text = np.zeros(total, dtype=bool)
    null_conv = np.zeros(total, dtype=bool)
    for j, r in enumerate(meta_rows):
        m = j % 4
        if m == 0:
            text[r] = ""
        elif m == 1:
            null_text[r] = True
        elif m == 2:
            turn_idx[r] = -1
        else:
            null_conv[r] = True

    # ge_range (501/502): gibberish (low lang_conf) or zh text (ppl out of band)
    range_rows = take(0.02)
    labels["ge_range"][range_rows] = True
    zh = _foreign_sentences("zh")
    for j, r in enumerate(range_rows):
        if j % 2 == 0:
            text[r] = _noise(rng, 80)
        else:
            # unique suffix => foreign plants never collide under exact dedup
            text[r] = f"{zh[int(rng.integers(0, len(zh)))]} {j}"

    # ge_buddy (10/1): locally-anomalous turn — clean sentence + noise chunk
    buddy_rows = take(0.02)
    labels["ge_buddy"][buddy_rows] = True
    for r in buddy_rows:
        text[r] = f"{pool[int(rng.integers(0, len(pool)))]} {_noise(rng, 40)}"

    # ge_dual (3): single non-English turn inside an all-English conversation
    dual_rows = take(0.02)
    labels["ge_dual"][dual_rows] = True
    for j, r in enumerate(dual_rows):
        lang = ("de", "fr", "es")[j % 3]
        fs = _foreign_sentences(lang)
        k = int(rng.integers(0, len(fs) - 1))
        text[r] = f"{fs[k]} {fs[k + 1]} {j + 2}."

    # ge_black (999): blacklist token present
    black_rows = take(0.005)
    labels["ge_black"][black_rows] = True
    for r in black_rows:
        text[r] = f"{text[r]} BLOCKLISTED_TOKEN"

    # ge_pii: scrubbed but kept
    pii_rows = take(0.02)
    labels["ge_pii"][pii_rows] = True
    for j, r in enumerate(pii_rows):
        m = j % 4
        if m == 0:
            extra = f"Contact me at user{j}@example.com please."
        elif m == 1:
            extra = "Call 555-123-4567 tomorrow."
        elif m == 2:
            extra = "My SSN is 123-45-6789 ok."
        else:
            extra = "That was a frakking good idea."
        text[r] = f"{text[r]} {extra}"

    # ge_dup: exact duplicate of an earlier clean turn's text
    dup_rows = take(0.01)
    clean = np.flatnonzero(~np.any(np.column_stack(list(labels.values())), axis=1) & eligible)
    src = rng.choice(clean, len(dup_rows), replace=False)
    labels["ge_dup"][dup_rows] = True
    for r, s in zip(dup_rows, src):
        text[r] = text[s]

    # keep-list: would-be buddy anomalies that must survive (990)
    keep_rows = take(0.002)
    is_keeplist[keep_rows] = True
    for r in keep_rows:
        text[r] = f"{pool[int(rng.integers(0, len(pool)))]} {_noise(rng, 40)}"

    # ge_zdem (902): stated-vs-derived metadata mismatch — role says 'tool'
    # with no tool name, or a tool name on a non-tool row (the transcript
    # analog of stated elevation vs DEM, check_z_against_dem.r:20-24).
    # Planted LAST so every earlier plant keeps its v1 position/draws.
    zdem_rows = take(0.005)
    labels["ge_zdem"][zdem_rows] = True
    for j, r in enumerate(zdem_rows):
        if j % 2 == 0:
            role[r] = "tool"
            tool[r] = ""
        else:
            role[r] = "assistant"
            tool[r] = "search_tool"

    text_arr = pa.array(list(text), type=pa.string(), mask=null_text)
    conv_arr = pa.array(list(conv_id), type=pa.string(), mask=null_conv)
    table = pa.table(
        {
            "conv_id": conv_arr,
            "turn_idx": pa.array(turn_idx, type=pa.int32()),
            "role": pa.array(list(role), type=pa.string()),
            "text": text_arr,
            "tool": pa.array(list(tool), type=pa.string()),
            "ts": pa.array(ts, type=pa.timestamp("us")),
            **{c: pa.array(v) for c, v in labels.items()},
            "is_keeplist": pa.array(is_keeplist),
        }
    )
    return table


def write_corpus(out_dir: str, n_turns: int, seed: int = 42, shards: int = 8, mega: bool = True) -> str:
    """Write the corpus as sharded parquet under ``out_dir`` (resumable-style
    layout: one file per conversation-range shard)."""
    import os

    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    table = generate_corpus(n_turns, seed=seed, mega=mega)
    n = table.num_rows
    bounds = np.linspace(0, n, shards + 1).astype(int)
    for s in range(shards):
        part = table.slice(bounds[s], bounds[s + 1] - bounds[s])
        pq.write_table(part, os.path.join(out_dir, f"part-{s:05d}.parquet"))
    return out_dir


def ensure_provider_sidecars(sf: float, root: str = "/tmp/titan_ray_corpus",
                             seed: int = 77) -> list[tuple[str, str]]:
    """Materialize (once) small CSV + JSONL provider files so the flagship
    exercises the heterogeneous-format union in the driver run, not only in
    pytest (round-4 verdict item 10) — the analog of the reference's
    multi-provider rbind (read_data_to_check.r:174-206). Conversation ids
    are provider-prefixed (the reference prefixes station ids per provider)
    so sidecar turns never merge into main-corpus conversations; rows are
    clean (no planted nulls — CSV cannot round-trip them) and `ts` is ISO
    text, exercising the string->timestamp cast. Returns (path, fmt) specs."""
    import os

    out = os.path.join(root, f"sf{sf:g}_providers")
    marker = os.path.join(out, "_SUCCESS")
    stamp = f"gen={CORPUS_GEN} seed={seed}"
    csv_path = os.path.join(out, "provider_b.csv")
    jsonl_path = os.path.join(out, "provider_c.jsonl")
    specs = [(csv_path, "csv"), (jsonl_path, "jsonl")]
    try:
        if open(marker).read().strip() == stamp:
            return specs
    except OSError:
        pass
    import shutil

    import pyarrow.compute as pc
    import pyarrow.csv as pacsv

    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)
    t = generate_corpus(240, seed=seed, mega=False)
    clean = pc.and_(pc.is_valid(t["conv_id"]), pc.is_valid(t["text"]))
    for c in GE_COLUMNS:
        clean = pc.and_(clean, pc.invert(t[c]))
    t = t.filter(clean).select(["conv_id", "turn_idx", "role", "text", "tool", "ts", "is_keeplist"])
    half = t.num_rows // 2
    for path, tag, part in ((csv_path, "pb", t.slice(0, half)), (jsonl_path, "pc", t.slice(half))):
        part = part.set_column(
            part.column_names.index("conv_id"), "conv_id",
            pc.binary_join_element_wise(pa.scalar(f"{tag}_"), part["conv_id"], ""),
        )
        part = part.set_column(
            part.column_names.index("ts"), "ts",
            # Arrow's %S prints seconds INCLUDING the fractional part
            pc.strftime(part["ts"], format="%Y-%m-%dT%H:%M:%S"),
        )
        if path.endswith(".csv"):
            pacsv.write_csv(part, path)
        else:
            part.to_pandas().to_json(path, orient="records", lines=True)
    with open(marker, "w") as f:
        f.write(stamp + "\n")
    return specs


def corpus_fingerprint(sf: float, root: str = "/tmp/titan_ray_corpus") -> str:
    """Content of the corpus _SUCCESS marker (n_turns + seed) — dependent
    caches (scored corpus, LSH candidates) embed it so a regenerated corpus
    invalidates them."""
    import os

    marker = os.path.join(root, f"sf{sf:g}", "_SUCCESS")
    try:
        return open(marker).read().strip()
    except OSError:
        return "absent"


def corpus_path_for_sf(sf: float, root: str = "/tmp/titan_ray_corpus", seed: int = 42) -> str:
    """Materialize (once) and return the corpus directory for a scale factor."""
    import os

    n_turns = max(600, int(6_000_000 * sf))
    out = os.path.join(root, f"sf{sf:g}")
    marker = os.path.join(out, "_SUCCESS")
    stamp = f"n_turns={n_turns} seed={seed} gen={CORPUS_GEN}"
    try:
        if open(marker).read().strip() == stamp:
            return out
    except OSError:
        pass
    import shutil

    shutil.rmtree(out, ignore_errors=True)
    write_corpus(out, n_turns, seed=seed)
    with open(marker, "w") as f:
        f.write(stamp + "\n")
    return out
