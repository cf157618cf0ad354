"""vimoclip_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework with the
capabilities of ViMoCLIP (reference: MarcosRodrigoT/VIMO-CLIP).

The reference is a three-stage PyTorch/CUDA pipeline (see /root/repo/SURVEY.md):

1. Teacher extraction   — frozen CLIP ViT encodes RGB frames -> HDF5 embeddings
                          (reference: extract_embeddings.py)
2. MoCLIP distillation  — CLIP-initialised student on motion frames, cosine
                          distillation + classification loss
                          (reference: train.py, models/student_model.py, losses.py)
3. TFAM fusion          — cross-attention transformer over paired RGB/motion
                          embedding sequences, multi-label sigmoid head
                          (reference: TFAM/models/AMO_CLIP.py, TFAM/train_and_eval.py)

This package re-designs the pipeline TPU-first:

- Flax models compiled with ``jax.jit``/``pjit`` over a ``jax.sharding.Mesh``
  (``vimoclip_tpu.parallel``) — data parallelism over ICI, optional tensor
  parallelism for the TFAM FFN, instead of ``torch.nn.DataParallel``.
- On-device fused preprocessing (uint8 decode-normalise, resize, frame-diff)
  in XLA and Pallas (``vimoclip_tpu.ops``), instead of per-frame PIL transforms
  inside ``forward`` (reference student_model.py:77-78).
- Host data plane: multi-threaded video decode + double-buffered device
  prefetch (``vimoclip_tpu.data``), instead of whole-video decode per sample
  (reference dataset.py:98).
- Orbax checkpointing with true train-resume; the reference only ever
  re-reads checkpoints for eval (SURVEY.md §5).

HDF5 file formats and CLI surfaces match the reference so its artifacts are
drop-in consumable.
"""

__version__ = "0.1.0"

from vimoclip_tpu import losses, metrics  # noqa: F401
