"""Metric suite tests."""
import numpy as np
import jax
import pytest
from PIL import Image, ImageDraw

from detikzify_tpu.config import tiny_test_config
from detikzify_tpu.evaluate.crystalbleu import (CrystalBLEU, tex_tokenize,
                                                trivially_shared_ngrams)
from detikzify_tpu.evaluate.eed import TexEditDistance, \
    extended_edit_distance
from detikzify_tpu.evaluate.harness import (ItemResult, PredictionCache,
                                            gather_interleaved,
                                            mean_sampling_throughput,
                                            mean_token_efficiency,
                                            shard_indices, winsorize)
from detikzify_tpu.evaluate.imagesim import ImageSim, sinkhorn_emd2
from detikzify_tpu.evaluate.kid import KernelInceptionDistance, poly_mmd2
from detikzify_tpu.models import detikzify, siglip


@pytest.fixture(scope="module")
def model():
    cfg = tiny_test_config()
    params = detikzify.init(jax.random.PRNGKey(0), cfg)
    return cfg, params


def _img(seed):
    img = Image.new("RGB", (64, 64), "white")
    d = ImageDraw.Draw(img)
    rng = np.random.default_rng(seed)
    for _ in range(4):
        x0, y0, x1, y1 = sorted(rng.integers(0, 63, 2).tolist()) + \
            sorted(rng.integers(0, 63, 2).tolist())
        d.rectangle([x0, x1, y0, y1] if x0 <= y0 else [y0, y1, x0, x1],
                    outline=tuple(rng.integers(0, 200, 3).tolist()))
    return img


def test_imagesim_identity_and_symmetry(model):
    cfg, params = model
    metric = ImageSim.from_detikzify(params, cfg)
    same = metric.score(_img(0), _img(0))
    diff = metric.score(_img(0), _img(1))
    assert same == pytest.approx(1.0, abs=1e-3)
    assert diff < same
    assert metric.score(_img(1), _img(0)) == pytest.approx(diff, abs=1e-3)


def test_imagesim_modes_and_state(model):
    cfg, params = model
    for mode in ("cos", "cos_avg", "emd"):
        metric = ImageSim(params.vision, cfg, mode=mode)
        metric.update(_img(0), _img(0))
        s = metric.compute()
        assert -1.0 <= s <= 1.0 + 1e-6
        metric.reset()
        with pytest.raises(RuntimeError):
            metric.compute()


def test_sinkhorn_emd2_known_value():
    # identical uniform distributions, zero-cost diagonal -> EMD ~ 0
    cost = 1.0 - np.eye(8)
    emd = float(sinkhorn_emd2(np.asarray(cost)[None], reg=0.01)[0])
    assert emd < 0.05
    # completely mismatched: all costs 1 -> EMD == 1
    cost = np.ones((8, 8))
    emd = float(sinkhorn_emd2(np.asarray(cost)[None], reg=0.01)[0])
    assert emd == pytest.approx(1.0, abs=1e-3)


def test_poly_mmd2_discrimination():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((40, 16))
    same = float(poly_mmd2(x[:20], x[20:]))
    shifted = float(poly_mmd2(x[:20], x[20:] + 3.0))
    assert shifted > same


def test_kid_metric(model):
    cfg, params = model
    kid = KernelInceptionDistance(params.vision, cfg, subset_size=4,
                                  subsets=8)
    kid.update([_img(i) for i in range(6)], real=True)
    kid.update([_img(i + 100) for i in range(6)], real=False)
    mean, std = kid.compute()
    assert np.isfinite(mean) and std >= 0


def test_tex_tokenize():
    toks = tex_tokenize("\\draw[red] (0,0) -- (1,1);")
    assert "\\draw" in toks or "\\draw[" in "".join(toks)
    assert len(toks) > 5


def test_crystalbleu_scores(tmp_path):
    corpus = ["\\draw (0,0) -- (1,1);" for _ in range(4)]
    metric = CrystalBLEU(corpus, k=2, cache_dir=str(tmp_path))
    metric.update(["\\draw (0,0) -- (1,1);"], [["\\draw (0,0) -- (1,1);"]])
    perfect = metric.compute()
    metric.reset()
    metric.update(["\\fill circle"], [["\\draw (0,0) -- (1,1);"]])
    bad = metric.compute()
    assert perfect > bad >= 0.0


def test_crystalbleu_cache(tmp_path):
    corpus = ["a b c d e"] * 3
    s1 = trivially_shared_ngrams(corpus, k=5, cache_dir=str(tmp_path))
    s2 = trivially_shared_ngrams(corpus, k=5, cache_dir=str(tmp_path))
    assert s1 == s2 and len(s1) == 5


def test_eed_bounds():
    assert extended_edit_distance(list("abc"), list("abc")) == \
        pytest.approx(0.0, abs=1e-9)
    far = extended_edit_distance(list("abc"), list("xyzw"))
    assert 0 < far <= 1.0
    metric = TexEditDistance()
    metric.update(["\\draw (0,0);"], [["\\draw (0,0);"]])
    assert metric.compute() == pytest.approx(0.0, abs=1e-9)


def test_winsorize_and_aggregates():
    vals = [1.0] * 18 + [100.0, -100.0]
    w = winsorize(vals, 0.05)
    assert w.max() < 100 and w.min() > -100
    eff = mean_token_efficiency([[10, 10, 5], [4]])
    assert 0 < eff <= 1
    assert mean_sampling_throughput([3, 3, 3]) == pytest.approx(3.0)


def test_prediction_cache(tmp_path):
    cache = PredictionCache(str(tmp_path / "preds.jsonl"))
    cache.put("item1", {"code": "x"})
    cache2 = PredictionCache(str(tmp_path / "preds.jsonl"))
    assert cache2.get("item1")["code"] == "x"
    assert cache2.get("missing") is None


def test_shard_indices_striped():
    assert shard_indices(10, 0, 4) == [0, 4, 8]
    assert shard_indices(10, 3, 4) == [3, 7]
    all_idx = sorted(sum((shard_indices(10, p, 4) for p in range(4)), []))
    assert all_idx == list(range(10))


def test_siglip_text_tower():
    import jax.numpy as jnp

    from detikzify_tpu.config import VisionConfig

    cfg = VisionConfig(hidden_size=32, intermediate_size=64,
                       num_hidden_layers=2, num_attention_heads=4,
                       image_size=28, patch_size=14)
    params = siglip.init_text(jax.random.PRNGKey(0), cfg, vocab_size=100,
                              max_positions=16)
    out = siglip.apply_text(params, cfg,
                            jnp.asarray(np.zeros((2, 16), np.int32)))
    assert out["pooler_output"].shape == (2, 32)


def test_feature_cache_hits(model):
    cfg, params = model
    metric = ImageSim.from_detikzify(params, cfg)
    a, b = _img(0), _img(1)
    metric.score(a, b)
    assert len(metric._feature_cache) == 2
    metric.score(_img(2), b)       # b's features reused
    assert len(metric._feature_cache) == 3
    s1 = metric.score(a, b)
    s2 = metric.score(a, b)        # fully cached path
    assert s1 == s2


def test_sync_metric_single_process(model):
    from detikzify_tpu.evaluate.dist import sync_metric

    cfg, params = model
    metric = ImageSim.from_detikzify(params, cfg)
    metric.update(_img(0), _img(0))
    metric.update(_img(0), _img(1))
    assert sync_metric(metric) == pytest.approx(metric.compute())
