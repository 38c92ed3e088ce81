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

# Top-level convenience API (lazy to keep bare import cheap).
def __getattr__(name):
    if name in ("load_config", "preset_path", "Config"):
        from fall_multimodal_tpu import configs
        return getattr(configs, name)
    if name == "build_model":
        from fall_multimodal_tpu.models import build_model
        return build_model
    if name in ("load_dataset", "split_dataset", "to_device", "make_synthetic"):
        from fall_multimodal_tpu import data
        return getattr(data, name)
    if name in ("fit", "evaluate", "create_train_state", "build_optimizer"):
        from fall_multimodal_tpu import train
        return getattr(train, name)
    if name in ("Predictor", "StreamingClassifier"):
        from fall_multimodal_tpu import serve
        return getattr(serve, name)
    if name in ("PredictionServer", "make_server"):
        from fall_multimodal_tpu import server
        return getattr(server, name)
    if name in ("load_pretrained_torch", "torch_to_variables",
                "load_torch_state_dict"):
        from fall_multimodal_tpu import interop
        return getattr(interop, name)
    raise AttributeError(f"module 'fall_multimodal_tpu' has no attribute {name!r}")
