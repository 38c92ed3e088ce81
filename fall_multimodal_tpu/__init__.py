"""fall_multimodal_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for
multimodal human fall detection / activity recognition.

Re-designed from scratch with the capabilities of the PyTorch reference
``musaru/Fall_Multimodal`` (see SURVEY.md): skeleton-stream graph networks
(ST-GCN with channel attention / GSTCAN, adaptive-adjacency EmbGCN / TARGCN,
skeleton transformer), wearable-sensor encoders (1D-CNN, BiLSTM / GRU), and
2-/3-stream late-fusion heads, trained end-to-end with video-level splits and
k-fold cross-validation.

TPU-first design decisions (vs. the reference):

* internal tensor layout is ``(N, T, V, C)`` — channels map onto TPU vector
  lanes, so every 1x1 convolution is an MXU matmul;
* the full dataset lives in HBM and an epoch is a single jitted
  ``lax.scan`` over shuffled batches — no DataLoader workers, no per-batch
  host->device copies;
* parallelism is a data-parallel ``jax.sharding.Mesh`` with XLA collectives,
  not translated process groups;
* the hot GSTCAN block (graph conv -> temporal conv -> squeeze-excite ->
  residual) has an optional fused Pallas kernel.
"""

__version__ = "0.1.0"
