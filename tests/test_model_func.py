"""Challenge-contract machinery: InferencePipeline PNG→PNG with tiny experts."""

import os

import numpy as np

from freqfusion_tpu.infer.io import InferencePipeline
from freqfusion_tpu.models.fusion import FusionConfig
from freqfusion_tpu.utils.imageio import load_image, save_image

TINY = dict(
    hat_kwargs=dict(embed_dim=24, depths=(1,), num_heads=(2,), window=4, squeeze=6),
    dat_kwargs=dict(embed_dim=32, depths=(1,), num_heads=(2,), split_size=(2, 4),
                    expansion=2.0),
    nafnet_kwargs=dict(width=8, middle_blk_num=1, enc_blk_nums=(1, 1),
                       dec_blk_nums=(1, 1)),
)


def test_pipeline_png_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    lr = rng.uniform(size=(20, 28, 3)).astype(np.float32)
    in_png = tmp_path / "img01.png"
    save_image(lr, str(in_png))

    pipe = InferencePipeline(
        model_dir="",  # random weights (missing-checkpoint path)
        tile=16, overlap=4, tile_batch=2,
        fusion_config=FusionConfig(fusion_dim=16, num_heads=2, refine_depth=2,
                                   refine_channels=8),
        expert_kwargs=TINY, n_devices=1)
    sr = pipe.run_image(load_image(str(in_png)))
    assert sr.shape == (80, 112, 3)
    assert sr.min() >= 0.0 and sr.max() <= 1.0

    out_png = tmp_path / "out" / "img01.png"
    save_image(sr, str(out_png))
    assert os.path.exists(out_png)
    round_trip = load_image(str(out_png))
    assert round_trip.shape == (80, 112, 3)


def test_sharded_whole_image_u8_batch():
    """Mesh serving runs the same uint8 whole-image protocol as one chip:
    a same-bucket batch shards over ('data',), ragged tails pad by repeat,
    and outputs match the f32 run_image path to 1 uint8 LSB."""
    import jax
    import pytest

    if len(jax.devices()) < 4:
        pytest.skip("needs >=4 (virtual) devices")

    pipe = InferencePipeline(
        model_dir="", tile=16, overlap=4, tile_batch=4,
        fusion_config=FusionConfig(fusion_dim=16, num_heads=2, refine_depth=2,
                                   refine_channels=8),
        expert_kwargs=TINY, n_devices=4)
    assert pipe.mesh is not None and pipe.u8_group_max == 4

    # the f32 whole-image reference comes from a SINGLE-chip pipeline with
    # identical (seeded) weights: on a mesh, run_image deliberately tiles a
    # lone image (sharding real tiles beats replicating one image), so it
    # is no longer the whole-image reference path
    ref_pipe = InferencePipeline(
        model_dir="", tile=16, overlap=4, tile_batch=1,
        fusion_config=FusionConfig(fusion_dim=16, num_heads=2, refine_depth=2,
                                   refine_channels=8),
        expert_kwargs=TINY, n_devices=1)

    rng = np.random.default_rng(1)
    lrs = [rng.uniform(size=(40 + 2 * i, 56, 3)).astype(np.float32)
           for i in range(3)]  # same 64x64-px bucket, ragged batch of 3
    handle = pipe.dispatch_batch_u8(lrs)
    assert handle is not None
    outs = pipe.materialize_u8(handle)
    assert len(outs) == 3
    for lr, u8 in zip(lrs, outs):
        assert u8.shape == (lr.shape[0] * 4, lr.shape[1] * 4, 3)
        assert u8.dtype == np.uint8
        ref = np.round(np.clip(ref_pipe.run_image(lr), 0.0, 1.0) * 255.0)
        assert np.abs(ref - u8.astype(np.float64)).max() <= 1.0


def test_whole_image_cliff_warns():
    """Tiled fallbacks (pixel budget / shape-cache cap) are logged, once."""
    import warnings as w

    pipe = InferencePipeline(
        model_dir="", tile=16, overlap=4, tile_batch=1,
        fusion_config=FusionConfig(fusion_dim=16, num_heads=2, refine_depth=2,
                                   refine_channels=8),
        expert_kwargs=TINY, n_devices=1)

    pipe.WHOLE_IMAGE_MAX_PX = 64 * 64
    with w.catch_warnings(record=True) as rec:
        w.simplefilter("always")
        assert pipe._whole_image_plan(96, 96) is None
        assert pipe._whole_image_plan(96, 96) is None  # second: silent
    assert len([r for r in rec if "FREQFUSION_WHOLE_IMAGE_PX" in
                str(r.message)]) == 1

    pipe.WHOLE_IMAGE_MAX_PX = 10 ** 9
    pipe.WHOLE_IMAGE_MAX_SHAPES = 1
    assert pipe._whole_image_plan(64, 64) is not None
    with w.catch_warnings(record=True) as rec:
        w.simplefilter("always")
        assert pipe._whole_image_plan(128, 128) is None
    assert any("shape cache full" in str(r.message) for r in rec)


def test_whole_image_cap_pads_up_to_compiled_bucket():
    """Cache-cap overflow pads UP to an already-compiled dominating bucket
    (≤30% extra compute) instead of the ~25%-slower tiled fallback
    (VERDICT r5 #5). Oversized overhead still tiles."""
    import warnings as w

    pipe = InferencePipeline(
        model_dir="", tile=16, overlap=4, tile_batch=1,
        fusion_config=FusionConfig(fusion_dim=16, num_heads=2, refine_depth=2,
                                   refine_channels=8),
        expert_kwargs=TINY, n_devices=1)
    pipe.WHOLE_IMAGE_MAX_PX = 10 ** 9
    pipe.WHOLE_IMAGE_MAX_SHAPES = 1
    assert pipe._whole_image_plan(500, 510) == (512, 512)   # DIV2K-class
    with w.catch_warnings(record=True) as rec:
        w.simplefilter("always")
        # 400x510 buckets to 416x512; (512,512) dominates at +23% → pad up
        assert pipe._whole_image_plan(400, 510) == (512, 512)
    assert any("pads up to the compiled" in str(r.message) for r in rec)
    # 180x510 buckets to 192x512; (512,512) would be +167% → tiled
    with w.catch_warnings(record=True) as rec:
        w.simplefilter("always")
        assert pipe._whole_image_plan(180, 510) is None
    assert any("shape cache full" in str(r.message) for r in rec)


def test_bucket_histogram_div2k_proxy():
    """The policy simulator (scripts/bucket_histogram.py) on a synthetic
    DIV2K-val-like shape list (100 frames, 510-long-side, DIV2K's real
    shapes aren't shipped offline): every image must serve whole-image
    (directly or padded up) with ≤6 compiled buckets under the default
    knobs — the PERF.md real-directory claim."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "bucket_histogram",
        os.path.join(os.path.dirname(__file__), "..", "scripts",
                     "bucket_histogram.py"))
    bh = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bh)

    rng = np.random.default_rng(0)
    shorter = rng.choice([339, 336, 344, 360, 384, 342, 340, 352, 330, 326,
                          388, 408, 510, 287, 320], size=100)
    shapes = [(int(s), 510) if rng.uniform() < 0.8 else (510, int(s))
              for s in shorter]
    res = bh.simulate(shapes)
    assert res["images"] == 100
    # ≥95% serve whole-image (the cap + pad-up policy); a small tail of
    # rare portrait buckets with >30% pad-up overhead tiles, correctly
    assert res["whole_image_pct"] >= 95.0, res
    assert res["padded_up"] > 0          # the pad-up path genuinely fires
    assert res["compiled_buckets"] <= 6
    assert res["distinct_buckets"] > 6   # the cap genuinely binds


def test_mesh_run_image_tiles_single_image(monkeypatch):
    """A lone image on a >1-device mesh takes the TILED path (shards real
    tiles) rather than replicating one image mesh-wide and keeping 1/N of
    the work; the whole-image protocol on a mesh is batch-only."""
    import jax
    import pytest

    if len(jax.devices()) < 4:
        pytest.skip("needs >=4 (virtual) devices")

    pipe = InferencePipeline(
        model_dir="", tile=16, overlap=4, tile_batch=4,
        fusion_config=FusionConfig(fusion_dim=16, num_heads=2, refine_depth=2,
                                   refine_channels=8),
        expert_kwargs=TINY, n_devices=4)
    assert pipe.mesh is not None

    calls = {"tiled": 0}
    from freqfusion_tpu.infer import io as io_mod
    real_tiled = io_mod.tiled_sr

    def counting_tiled(*a, **k):
        calls["tiled"] += 1
        return real_tiled(*a, **k)

    monkeypatch.setattr(io_mod, "tiled_sr", counting_tiled)
    rng = np.random.default_rng(2)
    lr = rng.uniform(size=(40, 56, 3)).astype(np.float32)
    sr = pipe.run_image(lr)
    assert calls["tiled"] == 1
    assert sr.shape == (160, 224, 3)
    # and no whole-image shape-cache entry was committed for it
    assert not getattr(pipe, "_whole_shapes", set())


def test_fast_random_variables_finite():
    """Shape-only random fill (bench/entry fast init) must produce a finite
    forward — guards the name-based fill rules (BN running_var etc.)."""
    import jax
    import jax.numpy as jnp

    from freqfusion_tpu.models.experts import FreqFusionSR
    from freqfusion_tpu.utils.runtime import fast_random_variables

    model = FreqFusionSR(
        FusionConfig(fusion_dim=16, num_heads=2, refine_depth=2,
                     refine_channels=8),
        **{**TINY, "dat_kwargs": dict(embed_dim=32, depths=(2, 2),
                                      num_heads=(2, 2), split_size=(2, 4),
                                      expansion=2.0)})
    d = jnp.zeros((1, 16, 16, 3), jnp.float32)
    v = fast_random_variables(model, d)
    out = np.asarray(model.apply(v, d))
    assert np.isfinite(out).all()

    # multi-dim projection params named *_weight (torch-layout, e.g. the
    # band-MHA in_proj_weight) must get a fan-in random init, not all-ones:
    # this fill is also the production no-checkpoint degraded serving mode,
    # and an all-ones [C,3C] projection saturates the attention softmax
    import jax.tree_util as jtu
    checked = 0
    for path, leaf in jtu.tree_leaves_with_path(v):
        name = str(path[-1].key if hasattr(path[-1], "key") else path[-1])
        if name.endswith("_weight") and np.ndim(leaf) >= 2:
            a = np.asarray(leaf)
            assert a.std() > 0, f"{name} filled with a constant"
            assert abs(a.mean()) < 0.1 and a.std() < 1.0, \
                f"{name} scale off: mean {a.mean()}, std {a.std()}"
            checked += 1
    assert checked > 0, "no multi-dim *_weight leaf exercised the rule"


def test_single_chip_u8_batch_pads_ragged(monkeypatch):
    """FREQFUSION_U8_BATCH>1 on one chip: ragged batches pad by repeat so
    only one program per bucket compiles; outputs unchanged."""
    monkeypatch.setenv("FREQFUSION_U8_BATCH", "2")
    pipe = InferencePipeline(
        model_dir="", tile=16, overlap=4, tile_batch=1,
        fusion_config=FusionConfig(fusion_dim=16, num_heads=2, refine_depth=2,
                                   refine_channels=8),
        expert_kwargs=TINY, n_devices=1)
    assert pipe.u8_group_max == 2
    rng = np.random.default_rng(2)
    lr = rng.uniform(size=(40, 56, 3)).astype(np.float32)
    import warnings as w
    with w.catch_warnings(record=True) as rec:
        w.simplefilter("always")
        outs = pipe.materialize_u8(pipe.dispatch_batch_u8([lr]))
        # the discarded-compute cliff warns ONCE per bucket (VERDICT r3 #6)
        pipe.dispatch_batch_u8([lr])
    assert len(outs) == 1 and outs[0].shape == (160, 224, 3)
    pad_warns = [r for r in rec if "ragged u8 batch" in str(r.message)]
    assert len(pad_warns) == 1
    ref = np.round(np.clip(pipe.run_image(lr), 0.0, 1.0) * 255.0)
    assert np.abs(ref - outs[0].astype(np.float64)).max() <= 1.0
