"""Model library: pure functions over parameter pytrees.

Inference-only (the reference exercises no training path; its posterior
encoder is deleted at load — /root/reference/rvc/infer/infer.py:99). Each
model is a pure jittable function taking a nested-dict param tree produced by
polgen_rvc_tpu.convert; weight-norm and batch-norm are folded at conversion so
the runtime graphs are plain conv/matmul chains that XLA fuses onto the MXU.
"""

from .synthesizer import SynthesizerConfig, synthesizer_infer, text_encoder, flow_reverse
from .nsf import sine_source, generator_nsf, generator
from .hubert import hubert_extract, HubertConfig
from .rmvpe import rmvpe_salience, rmvpe_f0
