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
