"""dna_tpu — a TPU-native genomic sequence-model training framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
`open-genome/dna` reference framework (HyenaDNA/safari fork with DNABERT-2,
NTv2, Caduceus model zoo and genomics finetuning pipelines).

Architecture (each layer only calls downward):

    cli / experiments      dna_tpu.config   (typed dataclass configs + overrides)
    train loop             dna_tpu.train    (jitted train/eval steps, loop, ckpt)
    tasks                  dna_tpu.train.tasks  (losses, metrics)
    data                   dna_tpu.data     (tokenizers, FASTA, masking, iterators)
    models                 dna_tpu.models   (flax modules: bert/hyena/mamba/esm/cnn)
    ops                    dna_tpu.ops      (Pallas kernels + XLA reference oracles)
    parallel               dna_tpu.parallel (mesh, shardings, collectives)

Everything in the compute path is functional and jit-compatible: static
shapes, `lax` control flow, shardings expressed as logical axis annotations
mapped onto a `jax.sharding.Mesh`.
"""

__version__ = "0.1.0"

from dna_tpu import registry  # noqa: F401
