"""Native CLIP-IQA: BPE tokenizer mechanics, text-tower conversion parity
vs a minimal torch mirror of OpenAI CLIP's text transformer, and the
evaluator go-live path (reference pyiqa `clipiqa` at
/root/reference/eval.py:51-56). Uses synthetic small-dim checkpoints and a
synthetic merges file — the official ckpt/vocab can't be fetched here."""

import numpy as np
import pytest

from conftest import has_torch

from freqfusion_tpu.utils.clipiqa import (
    CLIPTextTransformer, NativeCLIPIQA, SimpleBPETokenizer,
    bytes_to_unicode, clip_text_key_fn, infer_clip_config)


# ---------------------------------------------------------------------------
# tokenizer
# ---------------------------------------------------------------------------

def test_bytes_to_unicode_bijection():
    m = bytes_to_unicode()
    assert len(m) == 256 and len(set(m.values())) == 256
    assert m[ord("a")] == "a" and m[ord("!")] == "!"


def _write_merges(path, merges):
    path.write_text("#version: test\n" + "\n".join(" ".join(m)
                                                   for m in merges) + "\n")
    return str(path)


def test_bpe_merge_order_and_specials(tmp_path):
    # rank order matters: ("o","o") must merge before ("oo","d</w>")
    merges = [("o", "o"), ("oo", "d</w>"), ("g", "ood</w>"),
              ("p", "h"), ("t", "o</w>")]
    tok = SimpleBPETokenizer(_write_merges(tmp_path / "bpe.txt", merges))
    assert tok.vocab_size == 256 * 2 + len(merges) + 2
    assert tok.eot == tok.vocab_size - 1 and tok.sot == tok.vocab_size - 2

    ids = tok.encode("Good")  # lowercased, fully merged to one token
    assert ids == [tok.encoder["good</w>"]]
    # unmerged word falls back to byte symbols (+</w> on the last)
    assert tok.encode("ab") == [tok.encoder["a"], tok.encoder["b</w>"]]
    # punctuation splits off as its own token
    g, dot = tok.encode("good.")
    assert g == tok.encoder["good</w>"] and dot == tok.encoder[".</w>"]
    # the regex keeps contractions separate
    assert tok.encode("to's")[0] == tok.encoder["to</w>"]

    arr = tok.tokenize(["Good photo.", "Bad photo."], context=10)
    assert arr.shape == (2, 10) and arr.dtype == np.int32
    assert (arr[:, 0] == tok.sot).all()
    for row in arr:
        nz = row[row != 0]
        assert nz[-1] == tok.eot
        # EOT is the max id → argmax finds the feature position
        assert row.argmax() == len(nz) - 1


# ---------------------------------------------------------------------------
# text tower parity
# ---------------------------------------------------------------------------

def _synthetic_text_sd(vocab=96, width=32, layers=2, context=12, out=16,
                       seed=0):
    rng = np.random.default_rng(seed)
    f = lambda *s: rng.normal(size=s).astype(np.float32) * 0.05
    sd = {
        "token_embedding.weight": f(vocab, width),
        "positional_embedding": f(context, width),
        "ln_final.weight": 1 + f(width), "ln_final.bias": f(width),
        "text_projection": f(width, out),
        "logit_scale": np.float32(np.log(20.0)),
    }
    for i in range(layers):
        p = f"transformer.resblocks.{i}"
        sd.update({
            f"{p}.ln_1.weight": 1 + f(width), f"{p}.ln_1.bias": f(width),
            f"{p}.ln_2.weight": 1 + f(width), f"{p}.ln_2.bias": f(width),
            f"{p}.attn.in_proj_weight": f(3 * width, width),
            f"{p}.attn.in_proj_bias": f(3 * width),
            f"{p}.attn.out_proj.weight": f(width, width),
            f"{p}.attn.out_proj.bias": f(width),
            f"{p}.mlp.c_fc.weight": f(4 * width, width),
            f"{p}.mlp.c_fc.bias": f(4 * width),
            f"{p}.mlp.c_proj.weight": f(width, 4 * width),
            f"{p}.mlp.c_proj.bias": f(width),
        })
    return sd


def _torch_text_tower(sd, ids, width, heads, layers, context, out):
    """Minimal torch mirror of CLIP model.py's encode_text (causal mask)."""
    import torch
    import torch.nn.functional as F

    t = {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}
    ids_t = torch.from_numpy(ids.astype(np.int64))
    x = F.embedding(ids_t, t["token_embedding.weight"]) \
        + t["positional_embedding"]
    causal = torch.full((context, context), float("-inf")).triu(1)
    for i in range(layers):
        p = f"transformer.resblocks.{i}"
        h = F.layer_norm(x, (width,), t[f"{p}.ln_1.weight"],
                         t[f"{p}.ln_1.bias"], eps=1e-5)
        attn, _ = F.multi_head_attention_forward(
            h.transpose(0, 1), h.transpose(0, 1), h.transpose(0, 1),
            width, heads, t[f"{p}.attn.in_proj_weight"],
            t[f"{p}.attn.in_proj_bias"], None, None, False, 0.0,
            t[f"{p}.attn.out_proj.weight"], t[f"{p}.attn.out_proj.bias"],
            need_weights=False, attn_mask=causal)
        x = x + attn.transpose(0, 1)
        h = F.layer_norm(x, (width,), t[f"{p}.ln_2.weight"],
                         t[f"{p}.ln_2.bias"], eps=1e-5)
        h = F.linear(h, t[f"{p}.mlp.c_fc.weight"], t[f"{p}.mlp.c_fc.bias"])
        h = h * torch.sigmoid(1.702 * h)
        h = F.linear(h, t[f"{p}.mlp.c_proj.weight"],
                     t[f"{p}.mlp.c_proj.bias"])
        x = x + h
    x = F.layer_norm(x, (width,), t["ln_final.weight"], t["ln_final.bias"],
                     eps=1e-5)
    x = x[torch.arange(x.shape[0]), ids_t.argmax(dim=-1)]
    return (x @ t["text_projection"]).numpy()


@pytest.mark.skipif(not has_torch(), reason="torch unavailable")
def test_text_tower_parity_and_conversion():
    import jax
    import jax.numpy as jnp

    from freqfusion_tpu.utils import convert as cv

    vocab, width, heads, layers, context, out = 96, 32, 2, 2, 12, 16
    sd = _synthetic_text_sd(vocab, width, layers, context, out)
    model = CLIPTextTransformer(vocab_size=vocab, width=width, heads=heads,
                                layers=layers, context=context,
                                output_dim=out)
    variables = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, context), jnp.int32)))
    params, report = cv.fill_params(variables["params"], sd,
                                    clip_text_key_fn, strict=True)
    assert not report["missing"]

    rng = np.random.default_rng(1)
    ids = rng.integers(1, vocab - 2, size=(3, context)).astype(np.int32)
    ids[:, 0] = vocab - 2                       # SOT
    for r, stop in zip(ids, (4, 7, context - 1)):
        r[stop] = vocab - 1                     # EOT (max id)
        r[stop + 1:] = 0

    ours = np.asarray(model.apply({"params": params}, jnp.asarray(ids)))
    theirs = _torch_text_tower(sd, ids, width, heads, layers, context, out)
    np.testing.assert_allclose(ours, theirs, atol=2e-5, rtol=1e-4)


# ---------------------------------------------------------------------------
# full metric go-live
# ---------------------------------------------------------------------------

def _synthetic_full_sd(tmp_path, seed=0):
    import torch

    from test_clip_loss import _synthetic_sd as vision_sd
    sd = vision_sd(width=64, patch=32, layers=2, out=16, seed=seed)
    sd.update(_synthetic_text_sd(vocab=96, width=32, layers=2, context=12,
                                 out=16, seed=seed + 1))
    path = str(tmp_path / "clip_random.pth")
    torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()},
               path)
    return path, sd


@pytest.mark.skipif(not has_torch(), reason="torch unavailable")
def test_clipiqa_infer_config_and_score(tmp_path, monkeypatch):
    merges = [("o", "o"), ("oo", "d</w>"), ("g", "ood</w>")]
    # tokenizer vocab is huge (514+) vs the 96-entry embedding — clamp ids
    # is NOT done, so use prompts whose ids stay tiny via a custom pair
    bpe = _write_merges(tmp_path / "bpe.txt", merges)
    path, sd = _synthetic_full_sd(tmp_path)

    vision, text = infer_clip_config(sd)
    assert vision.width == 64 and vision.patch == 32 and vision.layers == 2
    assert text.vocab_size == 96 and text.context == 12 and text.layers == 2

    # the synthetic embedding has only 96 rows, so build a matching
    # tokenizer-free scorer by passing token ids through tiny prompts:
    # SimpleBPETokenizer ids exceed 96, so go-live here uses a real-side
    # test below; this one checks the converter + score math via modules.
    tok = SimpleBPETokenizer(bpe)
    assert tok.vocab_size > 96  # documents why prompts need a real vocab

    from freqfusion_tpu.utils.clipiqa import load_clip_full
    vision2, text2, vp, tp, scale = load_clip_full(None, None, path)
    assert np.isclose(scale, 20.0, rtol=1e-5)
    import jax.numpy as jnp
    ids = np.zeros((2, 12), np.int32)
    ids[:, 0], ids[0, 3], ids[1, 5] = 94, 95, 95
    tf = text2.apply(tp, jnp.asarray(ids))
    assert np.asarray(tf).shape == (2, 16)


@pytest.mark.skipif(not has_torch(), reason="torch unavailable")
def test_clipiqa_goes_live_in_evaluator(tmp_path, monkeypatch):
    import torch

    # embedding sized to the synthetic tokenizer's full vocab so the real
    # tokenize→embed→score path runs end to end
    merges = [("o", "o"), ("oo", "d</w>"), ("g", "ood</w>"), ("b", "ad</w>"),
              ("a", "d</w>"), ("p", "h"), ("ph", "ot"), ("phot", "o</w>")]
    bpe = _write_merges(tmp_path / "bpe.txt", merges)
    tok = SimpleBPETokenizer(bpe)

    from test_clip_loss import _synthetic_sd as vision_sd
    sd = vision_sd(width=64, patch=32, layers=2, out=16, seed=2)
    sd.update(_synthetic_text_sd(vocab=tok.vocab_size, width=32, layers=2,
                                 context=16, out=16, seed=3))
    path = str(tmp_path / "clip_random.pth")
    torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()},
               path)

    monkeypatch.setenv("FREQFUSION_CLIPIQA_WEIGHTS", path)
    monkeypatch.setenv("FREQFUSION_CLIP_BPE", bpe)

    from freqfusion_tpu.utils.perceptual_metrics import PerceptualEvaluator
    ev = PerceptualEvaluator()
    assert "clipiqa" in ev.available_metrics
    rng = np.random.default_rng(4)
    out = rng.integers(0, 256, size=(96, 96, 3), dtype=np.uint8)
    tgt = rng.integers(0, 256, size=(96, 96, 3), dtype=np.uint8)
    res = ev.evaluate_pair(out, tgt)
    assert np.isfinite(res["clipiqa"]) and 0.0 < res["clipiqa"] < 1.0
    # higher-is-better metric enters the aggregate directly
    score = ev.perceptual_score({"clipiqa": res["clipiqa"]})
    assert np.isclose(score, res["clipiqa"])


def test_clipiqa_unavailable_without_weights(monkeypatch):
    monkeypatch.delenv("FREQFUSION_CLIPIQA_WEIGHTS", raising=False)
    monkeypatch.delenv("FREQFUSION_CLIP_BPE", raising=False)
    with pytest.raises(RuntimeError):
        NativeCLIPIQA()
