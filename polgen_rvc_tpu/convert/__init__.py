"""Checkpoint converters: PyTorch state dicts -> JAX parameter pytrees.

One-time, host-side. Weight-norm (w = g * v / ||v||) and inference-mode
BatchNorm are folded here so runtime graphs carry plain weights.
Checkpoint formats covered (reference SURVEY.md §5.4):
  - RVC .pth: {config: [18 args], weight: state_dict, f0: 0/1, version}
  - hubert_base.pt: fairseq ensemble checkpoint
  - rmvpe.pt: raw E2E state_dict
  - fcpe.pt: {config, model}
  - faiss .index: IVF-Flat / Flat binary (parsed without faiss)
"""

from .common import fold_weight_norm, to_numpy
from .rvc_ckpt import load_rvc_checkpoint, convert_synthesizer_state
from .hubert_ckpt import load_hubert_checkpoint, convert_hubert_state
from .rmvpe_ckpt import load_rmvpe_checkpoint, convert_rmvpe_state
from .faiss_index import read_faiss_index
from . import synthetic
