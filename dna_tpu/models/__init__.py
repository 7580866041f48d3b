"""Model zoo. Importing this package populates the model registry."""

from dna_tpu.models import adapters, bert, cnn, esm, hyena, lm, mamba  # noqa: F401

from dna_tpu.models.bert import (  # noqa: F401
    BertEncoder,
    BertForMLM,
    BertForSequenceClassification,
)
from dna_tpu.models.hyena import HyenaFilter, HyenaOperator  # noqa: F401
from dna_tpu.models.lm import (  # noqa: F401
    DNAEmbeddingModel,
    LMBackbone,
    LMHeadModel,
)
