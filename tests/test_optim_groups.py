"""Per-parameter optimizer hyperparams (reference `_optim` hooks,
`hyena.py:228-231` + `optim_groups.py:100-141`) — VERDICT round-1 item 3:
the groups must change the *effective update*, not just exist in a table.
"""

import jax
import jax.numpy as jnp
import numpy as np

from dna_tpu.config.core import (DataConfig, OptimizerConfig,
                                 SchedulerConfig, TrainConfig)
from dna_tpu.train.optim import build_optimizer


def _params():
    return {
        "dense": {"kernel": jnp.ones((4, 4))},
        "mixer": {"hyena_filter": {
            "mlp_in": {"kernel": jnp.ones((4, 4))},
            "pos_z": jnp.ones((4,)),
        }},
        "ssm": {"A_log": jnp.ones((4,))},
    }


def _one_update(tx, params, grads):
    state = tx.init(params)
    updates, _ = tx.update(grads, state, params)
    return updates


def test_weight_decay_excludes_special_groups():
    ocfg = OptimizerConfig(name="adamw", lr=1e-3, weight_decay=0.1,
                           grad_clip=None)
    tx, _ = build_optimizer(ocfg, SchedulerConfig(name="constant"))
    params = _params()
    zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
    upd = _one_update(tx, params, zeros)
    # with zero grads, adamw's update is purely the decay term
    assert np.abs(upd["dense"]["kernel"]).max() > 0
    assert np.abs(upd["mixer"]["hyena_filter"]["mlp_in"]["kernel"]).max() == 0
    assert np.abs(upd["mixer"]["hyena_filter"]["pos_z"]).max() == 0
    assert np.abs(upd["ssm"]["A_log"]).max() == 0


def test_lr_overrides_scale_the_effective_update():
    ocfg = OptimizerConfig(name="adamw", lr=1e-3, weight_decay=0.0,
                           grad_clip=None, filter_lr=2e-3, lr_pos_emb=0.0)
    tx, _ = build_optimizer(ocfg, SchedulerConfig(name="constant"))
    params = _params()
    ones = jax.tree_util.tree_map(jnp.ones_like, params)
    upd = _one_update(tx, params, ones)
    dense = float(upd["dense"]["kernel"][0, 0])
    filt = float(upd["mixer"]["hyena_filter"]["mlp_in"]["kernel"][0, 0])
    pos = float(np.abs(upd["mixer"]["hyena_filter"]["pos_z"]).max())
    assert np.isclose(filt, 2.0 * dense, rtol=1e-5)  # filter_lr = 2× base
    assert pos == 0.0                                # lr_pos_emb = 0 freezes


def test_seqlen_stages_with_real_dataset(tmp_path):
    """Staged warmup over a *real* (bed+fasta) dataset with a per-stage
    accumulation factor — the reference's actual curriculum use-case
    (`seqlen_warmup_reload.yaml` + `train.py:644-661`)."""
    from pathlib import Path

    from dna_tpu.experiments import build, get_experiment
    from dna_tpu.train.loop import TrainLoop

    fix = Path(__file__).resolve().parent / "fixtures" / "hg38"
    cfg = get_experiment("hg38_hyena_tiny", [
        f"data.bed_path={fix}/seqs.bed", f"data.fasta_path={fix}/genome.fa",
        "data.batch_size=8", "model.max_len=128", "model.d_ff=64",
        "train.log_every=0",
        "train.seqlen_stages=[[64, 8, 2, 1], [128, 8, 2, 2]]",
    ])
    exp = build(cfg)
    assert type(exp.dataset).__name__ == "HG38Dataset"
    loop = TrainLoop(exp, verbose=False)
    p0 = jax.tree_util.tree_map(np.array, loop.state.params)
    res = loop.run_stages()
    assert int(loop.state.step) == 4  # 2 + 2 micro steps
    assert np.isfinite(res.final_metrics["loss"])
    changed = jax.tree_util.tree_map(
        lambda a, b: not np.allclose(a, b), p0, loop.state.params)
    assert any(jax.tree_util.tree_leaves(changed))


def test_mu_dtype_bf16():
    """optimizer.mu_dtype=bfloat16 stores Adam's first moment in bf16 and
    still trains (loss finite, params move)."""
    import jax
    import jax.numpy as jnp
    import optax

    from dna_tpu.config.core import OptimizerConfig, SchedulerConfig
    from dna_tpu.train.optim import build_optimizer

    ocfg = OptimizerConfig(name="adamw", lr=1e-2, mu_dtype="bfloat16")
    scfg = SchedulerConfig(name="constant")
    tx, _ = build_optimizer(ocfg, scfg)
    params = {"w": jnp.ones((4, 4), jnp.float32)}
    state = tx.init(params)
    mus = [l for l in jax.tree_util.tree_leaves(state)
           if hasattr(l, "dtype") and l.dtype == jnp.bfloat16]
    assert mus, "no bf16 moment found in optimizer state"
    g = {"w": jnp.full((4, 4), 0.5, jnp.float32)}
    upd, state = tx.update(g, state, params)
    new = optax.apply_updates(params, upd)
    assert bool(jnp.isfinite(new["w"]).all())
    assert float(jnp.abs(new["w"] - params["w"]).max()) > 0


def test_nu_dtype_bf16_and_fp32_equivalence():
    """optimizer.nu_dtype=bfloat16 stores the second moment in bf16; with
    fp32 moments the custom scale_by_adam path reproduces optax.adamw's
    updates exactly over several steps."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from dna_tpu.config.core import OptimizerConfig, SchedulerConfig
    from dna_tpu.train.optim import build_optimizer

    scfg = SchedulerConfig(name="constant")
    # bf16 nu actually stored
    tx, _ = build_optimizer(
        OptimizerConfig(name="adamw", lr=1e-2, nu_dtype="bfloat16"), scfg)
    params = {"w": jnp.ones((4, 4), jnp.float32)}
    state = tx.init(params)
    assert any(getattr(l, "dtype", None) == jnp.bfloat16
               for l in jax.tree_util.tree_leaves(state))

    # fp32 custom path == optax.adamw
    tx_c, _ = build_optimizer(
        OptimizerConfig(name="adamw", lr=1e-2, weight_decay=0.01,
                        nu_dtype="float32"), scfg)
    tx_o, _ = build_optimizer(
        OptimizerConfig(name="adamw", lr=1e-2, weight_decay=0.01), scfg)
    pc = po = {"w": jnp.linspace(-1, 1, 16).reshape(4, 4)}
    sc, so = tx_c.init(pc), tx_o.init(po)
    for i in range(5):
        g = {"w": jnp.full((4, 4), 0.1 * (i + 1), jnp.float32)}
        uc, sc = tx_c.update(g, sc, pc)
        uo, so = tx_o.update(g, so, po)
        pc = optax.apply_updates(pc, uc)
        po = optax.apply_updates(po, uo)
    np.testing.assert_allclose(np.asarray(pc["w"]), np.asarray(po["w"]),
                               atol=1e-6, rtol=1e-6)
