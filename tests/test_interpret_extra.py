"""Attribution, EMA, token classification, extra dataset formats."""

import csv

import jax
import jax.numpy as jnp
import numpy as np

from dna_tpu.config.core import ModelConfig
from dna_tpu.data.tokenizers import CharTokenizer
from dna_tpu.interpret import ism, occlusion, saliency


def test_ism_highlights_motif():
    """Attribution on a motif classifier must score motif positions higher
    than background."""
    import optax
    from dna_tpu.data.synthetic import SyntheticClassificationDataset
    from dna_tpu.models.cnn import DenoiseCNN

    m = DenoiseCNN(hidden_dim=32, num_conv1d=3, n_out=2, head="cls")
    ds = SyntheticClassificationDataset(max_length=64, num_samples=64)
    xs = jnp.asarray(np.stack([ds[i]["input_ids"] for i in range(64)]))
    ys = jnp.asarray(np.stack([ds[i]["labels"] for i in range(64)]))
    params = m.init(jax.random.key(0), xs[:2])["params"]
    tx = optax.adam(3e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        def loss_fn(p):
            return optax.softmax_cross_entropy_with_integer_labels(
                m.apply({"params": p}, xs), ys).mean()
        loss, grads = jax.value_and_grad(loss_fn)(params)
        upd, opt = tx.update(grads, opt)
        return optax.apply_updates(params, upd), opt, loss

    for _ in range(80):
        params, opt, _ = step(params, opt)

    # pick a positive example; motif = ACGTAC at known positions
    pos_idx = next(i for i in range(64) if int(ys[i]) == 1)
    attr = saliency(m, params, xs[pos_idx:pos_idx + 1],
                    target_fn=lambda lg: lg[:, 1])
    # motif positions: find ACGTAC in char ids (A=7 C=8 G=9 T=10)
    ids = np.asarray(xs[pos_idx])
    motif = np.array([7, 8, 9, 10, 7, 8])
    hits = [i for i in range(len(ids) - 6)
            if np.array_equal(ids[i:i + 6], motif)]
    assert hits, "no motif found in positive example"
    motif_mask = np.zeros(len(ids), bool)
    for h in hits:
        motif_mask[h:h + 6] = True
    attr = np.asarray(attr)
    assert attr[motif_mask].mean() > attr[~motif_mask].mean() * 1.5


def test_ema_params_track():
    from dna_tpu.config.core import MeshConfig
    from dna_tpu.data.loader import ShardedLoader
    from dna_tpu.experiments import build, get_experiment
    from dna_tpu.parallel.mesh import build_mesh
    from dna_tpu.train.state import create_train_state
    from dna_tpu.train.step import make_eval_step, make_train_step

    cfg = get_experiment("dnabert2_pretrain_tiny",
                         ["data.batch_size=16", "train.ema=0.9"])
    mesh = build_mesh(MeshConfig(dp=2))
    exp = build(cfg, mesh=mesh)
    dummy = jnp.zeros((2, cfg.data.max_length), jnp.int32)
    init = lambda r: exp.model.init(r, dummy, None, deterministic=True)["params"]
    state, sh = create_train_state(init, exp.tx, mesh, exp.rules,
                                   jax.random.key(0), ema=0.9)
    assert state.ema_params is not None
    step = make_train_step(exp.model, exp.task_fn, exp.tx, mesh, exp.rules,
                           sh, ema=0.9)
    state2 = state
    for i, b in enumerate(ShardedLoader(exp.dataset, 16, seed=0)):
        if i >= 5:
            break
        state2, _ = step(state2, b)
    # ema params lag the live params
    import flax.linen as nn
    diffs = jax.tree_util.tree_map(
        lambda p, e: float(jnp.abs(p - e).max()),
        nn.meta.unbox(state2.params), nn.meta.unbox(state2.ema_params))
    assert max(jax.tree_util.tree_leaves(diffs)) > 1e-6
    ev = make_eval_step(exp.model, exp.task_fn, mesh, exp.rules, sh)
    m = ev(state2, b)
    assert np.isfinite(float(m["loss"]))


def test_token_classification_head():
    from dna_tpu.models.esm import EsmForTokenClassification

    cfg = ModelConfig(vocab_size=32, d_model=32, n_layers=1, n_heads=2,
                      d_ff=64, n_classes=3, rotary=True, dtype="float32")
    m = EsmForTokenClassification(cfg)
    ids = jnp.zeros((2, 16), jnp.int32)
    params = m.init(jax.random.key(0), ids, None, deterministic=True)
    out = m.apply(params, ids, None, deterministic=True)
    assert out.shape == (2, 16, 3)


def test_dnaberts_and_chromatin_formats(tmp_path):
    from dna_tpu.data.genomics import ChromatinProfileDataset, DNABertSPairDataset

    rng = np.random.default_rng(0)
    tok = CharTokenizer()

    pairs = tmp_path / "pairs.csv"
    with open(pairs, "w") as f:
        w = csv.writer(f)
        w.writerow(["seq_a", "seq_b"])
        for _ in range(4):
            w.writerow(["".join(rng.choice(list("ACGT"), 30)),
                        "".join(rng.choice(list("ACGT"), 30))])
    ds = DNABertSPairDataset(str(pairs), tok, max_length=32)
    ex = ds[0]
    assert ex["input_ids"].shape == (32,)

    fa = tmp_path / "g.fa"
    seq = "".join(rng.choice(list("ACGT"), 400))
    fa.write_text(">chr1\n" + seq + "\n")
    coords = tmp_path / "coords.csv"
    with open(coords, "w") as f:
        w = csv.writer(f)
        w.writerow(["Chr_No", "Start", "y_0", "y_1", "y_2"])
        for s in (0, 50, 100):
            w.writerow(["chr1", s, 1, 0, 1])
    cp = ChromatinProfileDataset(str(coords), str(fa), tok, max_length=100)
    ex = cp[1]
    assert ex["input_ids"].shape == (100,)
    np.testing.assert_array_equal(ex["labels"], [1, 0, 1])


def test_hg38_fixed_windows(tmp_path):
    from dna_tpu.data.genomics import HG38FixedDataset

    rng = np.random.default_rng(1)
    fa = tmp_path / "g.fa"
    fa.write_text(">chr14\n" + "".join(rng.choice(list("ACGT"), 1000)) + "\n")
    ds = HG38FixedDataset(str(fa), CharTokenizer(), chromosomes=["chr14"],
                          max_length=128)
    assert len(ds) == 7  # window starts at 0,128,...,768 fit in 1000-129
    a, b = ds[0], ds[0]
    np.testing.assert_array_equal(a["input_ids"], b["input_ids"])  # fixed


def test_gradcam_on_denoise_cnn():
    """Grad-CAM++ conv-feature attribution (reference
    `visualize/gradcam.py:161`): on a trained motif classifier the heatmap
    must (a) be a normalized [0,1] vector of the requested length, and
    (b) peak near the motif."""
    import optax
    from dna_tpu.data.synthetic import SyntheticClassificationDataset
    from dna_tpu.interpret import gradcam
    from dna_tpu.models.cnn import DenoiseCNN

    m = DenoiseCNN(hidden_dim=32, num_conv1d=3, n_out=2, head="cls")
    ds = SyntheticClassificationDataset(max_length=64, num_samples=64)
    xs = jnp.asarray(np.stack([ds[i]["input_ids"] for i in range(64)]))
    ys = jnp.asarray(np.stack([ds[i]["labels"] for i in range(64)]))
    params = m.init(jax.random.key(0), xs[:2])["params"]
    tx = optax.adam(3e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        def loss_fn(p):
            return optax.softmax_cross_entropy_with_integer_labels(
                m.apply({"params": p}, xs), ys).mean()
        loss, grads = jax.value_and_grad(loss_fn)(params)
        upd, opt = tx.update(grads, opt)
        return optax.apply_updates(params, upd), opt, loss

    for _ in range(80):
        params, opt, _ = step(params, opt)

    pos_idx = next(i for i in range(64) if int(ys[i]) == 1)
    heat = gradcam(m, params, xs[pos_idx:pos_idx + 1], layer="conv_1",
                   target_fn=lambda lg: lg[:, 1], out_len=64)
    heat = np.asarray(heat)
    assert heat.shape == (64,)
    assert heat.min() >= 0.0 and heat.max() <= 1.0 + 1e-6
    assert heat.max() > 0.5  # normalized: some position peaks

    # the peak should sit in/near the motif (± receptive-field slack)
    ids = np.asarray(xs[pos_idx])
    motif = np.array([7, 8, 9, 10, 7, 8])
    hits = [i for i in range(len(ids) - 6)
            if np.array_equal(ids[i:i + 6], motif)]
    assert hits
    peak = int(np.argmax(heat))
    assert any(h - 8 <= peak <= h + 14 for h in hits), (peak, hits)

    # unknown layer raises
    import pytest
    with pytest.raises(ValueError, match="no captured intermediate"):
        gradcam(m, params, xs[:1], layer="nope_layer")
