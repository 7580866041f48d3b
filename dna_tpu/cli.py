"""CLI entry point.

Usage (reference: `python train.py experiment=<group/name> key=value ...`):

    python -m dna_tpu.cli experiment=dnabert2_pretrain data.batch_size=256 \
        train.steps=1000 mesh.dp=-1

Every `key=value` after the experiment is a dotted-path override onto the
typed config tree.
"""

from __future__ import annotations

import sys

import jax


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] in ("-h", "--help"):
        from dna_tpu import registry
        import dna_tpu.experiments  # noqa: F401

        print(__doc__)
        print("experiments:", ", ".join(registry.experiment.names()))
        return 0

    overrides = []
    experiment = None
    for arg in argv:
        if arg.startswith("experiment="):
            experiment = arg.split("=", 1)[1]
        else:
            overrides.append(arg)
    if experiment is None:
        raise SystemExit("missing experiment=<name>")

    from dna_tpu.config.core import pretty
    from dna_tpu.experiments import build, get_experiment
    from dna_tpu.train.loop import TrainLoop

    cfg = get_experiment(experiment, overrides)
    print(pretty(cfg))
    exp = build(cfg)
    loop = TrainLoop(exp, log_dir=cfg.train.checkpoint_dir or ".")
    print(f"devices: {jax.devices()}")
    print(f"params: {loop.n_params/1e6:.2f}M")
    result = loop.run()
    print("final:", result.final_metrics)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
