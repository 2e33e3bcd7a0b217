"""Near-dup suite + multimodal plumbing tests."""

import numpy as np
import pyarrow as pa

from titan_ray.stages.neardup import (
    band_hashes,
    hamming_distance,
    minhash_signatures,
    simhash_signatures,
)
from titan_ray.stages.multimodal import MediaDecodeStage, media_features, synth_media_table


NEAR_A = "the quick brown fox jumps over the lazy dog near the river bank today"
NEAR_B = "the quick brown fox jumps over the lazy dog near the river bank now"
FAR = "completely different content about data pipelines and streaming engines"


def test_minhash_similarity_ordering():
    sig = minhash_signatures(pa.array([NEAR_A, NEAR_B, FAR]))
    est_near = (sig[0] == sig[1]).mean()
    est_far = (sig[0] == sig[2]).mean()
    assert est_near > 0.6 > est_far


def test_minhash_deterministic():
    a = minhash_signatures(pa.array([NEAR_A]))
    b = minhash_signatures(pa.array([NEAR_A]))
    assert (a == b).all()


def test_band_hashes_candidates():
    sig = minhash_signatures(pa.array([NEAR_A, NEAR_B, FAR]))
    bh = band_hashes(sig)
    assert (bh[0] == bh[1]).sum() >= 1      # near pair shares a band
    assert (bh[0] == bh[2]).sum() == 0      # far pair shares none


def test_simhash_hamming():
    sh = simhash_signatures(pa.array([NEAR_A, NEAR_B, FAR]))
    assert hamming_distance(sh[:1], sh[1:2])[0] < 10
    assert hamming_distance(sh[:1], sh[2:3])[0] > 15


def test_short_rows_get_empty_signatures():
    sig = minhash_signatures(pa.array(["ab", None]))
    assert (sig == np.iinfo(np.uint64).max).all()


def test_media_decode_stage_direct():
    stage = MediaDecodeStage(feature_dim=4)
    out = stage(synth_media_table(8))
    assert out.column_names == ["media_id", "kind", "n_bytes", "features"]
    assert len(out["features"][0].as_py()) == 4


def test_media_decode_real_codec_is_stubbed():
    import pytest

    stage = MediaDecodeStage(fake=False)
    with pytest.raises(NotImplementedError):
        stage(synth_media_table(1))


def test_media_features_pipeline(ray_session):
    out = media_features(synth_media_table(32), batch_size=8).to_pandas()
    assert len(out) == 32
    # deterministic digest features
    out2 = media_features(synth_media_table(32), batch_size=4).to_pandas()
    a = out.sort_values("media_id").reset_index(drop=True)
    b = out2.sort_values("media_id").reset_index(drop=True)
    assert (a["features"].map(tuple) == b["features"].map(tuple)).all()
