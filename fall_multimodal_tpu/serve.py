"""Serving layer: checkpoint -> compiled predictor -> streaming classifier.

The reference has no inference/serving surface at all (SURVEY.md section 1,
L5 note) — this layer is new capability designed for production deployment:

* :class:`Predictor` — loads a trained checkpoint, jits a fixed-batch
  forward (ragged requests padded + masked), returns probabilities /
  classes; optional k-copies strided averaging; AOT-exportable;
* :func:`export_stablehlo` — serialize the forward with ``jax.export`` to
  portable StableHLO bytes (deployable without Python model code);
* :class:`StreamingClassifier` — online sliding-window inference over a
  live pose/sensor stream: push frames, get a class decision per step once
  the window fills, mirroring the offline stride-1 window semantics.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fall_multimodal_tpu.configs import Config
from fall_multimodal_tpu.models import build_model, uses_sensor
from fall_multimodal_tpu.train.loop import k_copies_logits


class Predictor:
    """Fixed-batch compiled predictor around a trained model.

    ``batch_size`` is the compiled shape; smaller requests are padded and
    masked, larger ones chunked. One compilation per distinct batch size.
    """

    def __init__(
        self,
        config: Config,
        variables: Dict[str, Any],
        batch_size: int = 128,
        num_copies: int = 1,
    ):
        self.config = config
        self.model = build_model(config)
        self.variables = variables
        self.batch_size = batch_size
        self.num_copies = num_copies
        # sensor-consuming families must refuse sensor=None instead of
        # silently classifying on zeroed sensors (round-2 weakness #3)
        self.requires_sensor = uses_sensor(config.model.name)

        def forward(variables, skeleton, sensor):
            if num_copies > 1:
                return k_copies_logits(
                    self.model, variables, skeleton, sensor, num_copies
                )
            return self.model.apply(variables, skeleton, sensor, train=False)

        self._forward = jax.jit(forward)

    def with_batch_size(self, batch_size: int) -> "Predictor":
        """A predictor over the same weights compiled at a different batch
        (e.g. batch 1 for streaming) — no checkpoint reload."""
        if batch_size == self.batch_size:
            return self
        return Predictor(
            self.config, self.variables,
            batch_size=batch_size, num_copies=self.num_copies,
        )

    @classmethod
    def from_checkpoint(
        cls,
        config: Config,
        checkpoint_dir: str,
        sample_skeleton: np.ndarray,
        sample_sensor: np.ndarray,
        which: str = "best",
        **kwargs,
    ) -> "Predictor":
        from fall_multimodal_tpu.train.optim import build_optimizer
        from fall_multimodal_tpu.train.state import create_train_state
        from fall_multimodal_tpu.utils.checkpoint import Checkpointer

        model = build_model(config)
        optimizer = build_optimizer(config)
        template = create_train_state(
            model,
            optimizer,
            jnp.asarray(sample_skeleton[:2]),
            jnp.asarray(sample_sensor[:2]),
            seed=config.seed,
        )
        state, _, _ = Checkpointer(checkpoint_dir).restore(which, template)
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        return cls(config, variables, **kwargs)

    @classmethod
    def from_torch_checkpoint(
        cls, config: Config, path: str, strict: bool = True, **kwargs
    ) -> "Predictor":
        """Serve a checkpoint trained with the REFERENCE (PyTorch) code:
        ``best_model.pt`` / ``checkpoint.pt`` / ``.npz`` of named arrays,
        converted via :mod:`fall_multimodal_tpu.interop` (validated
        key-for-key against this config's model)."""
        from fall_multimodal_tpu.interop import load_pretrained_torch

        variables = load_pretrained_torch(config, path, strict=strict)
        return cls(config, variables, **kwargs)

    def predict_logits(
        self, skeleton: np.ndarray, sensor: Optional[np.ndarray] = None
    ) -> np.ndarray:
        n = len(skeleton)
        if sensor is None:
            if self.requires_sensor:
                raise ValueError(
                    f"model {self.config.model.name!r} consumes the sensor "
                    "stream; pass sensor=(N, T, S) windows (zero-filling "
                    "would silently classify on fabricated sensor data)"
                )
            # skeleton-only models ignore the stream; a (N,1,1) placeholder
            # keeps the uniform (skeleton, sensor) forward contract
            sensor = np.zeros((n, 1, 1), np.float32)
        elif len(sensor) != n:
            raise ValueError(
                f"skeleton has {n} windows but sensor has {len(sensor)} — "
                "the streams pair by index; counts must match"
            )
        if n == 0:
            num_classes = self.config.data.num_classes
            return np.zeros((0, num_classes), np.float32)
        outs = []
        for start in range(0, n, self.batch_size):
            sk = np.asarray(skeleton[start : start + self.batch_size], np.float32)
            se = np.asarray(sensor[start : start + self.batch_size], np.float32)
            pad = self.batch_size - len(sk)
            if pad:
                sk = np.concatenate([sk, np.repeat(sk[-1:], pad, axis=0)])
                se = np.concatenate([se, np.repeat(se[-1:], pad, axis=0)])
            logits = self._forward(self.variables, jnp.asarray(sk), jnp.asarray(se))
            outs.append(np.asarray(logits)[: self.batch_size - pad])
        return np.concatenate(outs)

    def predict_proba(self, skeleton, sensor=None) -> np.ndarray:
        return np.asarray(jax.nn.softmax(jnp.asarray(self.predict_logits(skeleton, sensor)), -1))

    def predict(self, skeleton, sensor=None) -> np.ndarray:
        return self.predict_logits(skeleton, sensor).argmax(-1)


def export_stablehlo(
    config: Config,
    variables: Dict[str, Any],
    skeleton_shape: Tuple[int, ...],
    sensor_shape: Tuple[int, ...],
) -> bytes:
    """Serialize the eval forward to portable StableHLO bytes via
    ``jax.export`` (deployable from any PJRT runtime without model code)."""
    from jax import export as jax_export

    model = build_model(config)

    def forward(variables, skeleton, sensor):
        return model.apply(variables, skeleton, sensor, train=False)

    exported = jax_export.export(jax.jit(forward))(
        jax.tree.map(lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), variables),
        jax.ShapeDtypeStruct(skeleton_shape, jnp.float32),
        jax.ShapeDtypeStruct(sensor_shape, jnp.float32),
    )
    return exported.serialize()


def load_stablehlo(blob: bytes):
    """Deserialize an exported forward; returns a callable
    (variables, skeleton, sensor) -> logits."""
    from jax import export as jax_export

    exported = jax_export.deserialize(blob)
    return exported.call


class StreamingClassifier:
    """Online sliding-window classifier over a live frame stream.

    Push one frame (pose (V, C) [+ sensor (S,)]) at a time; once ``seq_len``
    frames accumulate, every push classifies the trailing window — the
    online equivalent of the offline stride-1 windowing. ``smooth`` > 1
    majority-votes over the last k decisions (cheap temporal smoothing for
    alarm stability).

    Latency: each push runs exactly ONE window through a batch-1 compiled
    forward — the classifier derives a batch-1 predictor over the same
    weights at construction (one extra compile), instead of padding the
    single window up to the offline predictor's batch (the round-2 path
    wasted ~batch_size x compute per push). Measured p50/p99 per-push
    latency on v5e: PARITY.md "Serving latency".
    """

    def __init__(self, predictor: Predictor, seq_len: int = 30, smooth: int = 1):
        self.predictor = predictor.with_batch_size(1)
        self.seq_len = seq_len
        self.smooth = max(1, smooth)
        self._pose: list = []
        self._sensor: list = []
        self._votes: list = []

    def reset(self) -> None:
        self._pose.clear()
        self._sensor.clear()
        self._votes.clear()

    def push(
        self, pose_frame: np.ndarray, sensor_frame: Optional[np.ndarray] = None
    ) -> Optional[int]:
        # the pose and sensor ring buffers must advance in lockstep: a
        # push that omits (or spuriously adds) a sensor frame would either
        # break the compiled window shape or silently classify on a sensor
        # window temporally misaligned with the pose window — the exact
        # silent-wrong-data failure ``requires_sensor`` exists to prevent
        if sensor_frame is None:
            if self.predictor.requires_sensor:
                raise ValueError(
                    f"model {self.predictor.config.model.name!r} consumes "
                    "the sensor stream; every push needs a sensor_frame (a "
                    "dropped frame would desynchronize the pose/sensor "
                    "windows — re-push the last known sensor reading "
                    "explicitly if that is the intended degradation)"
                )
            if self._sensor:
                raise ValueError(
                    "inconsistent stream: earlier pushes carried "
                    "sensor_frame, this one does not; push a sensor frame "
                    "with every pose frame or with none"
                )
        else:
            if len(self._sensor) != len(self._pose):
                raise ValueError(
                    "inconsistent stream: earlier pushes omitted "
                    "sensor_frame; push a sensor frame with every pose "
                    "frame or with none"
                )
            self._sensor.append(np.asarray(sensor_frame, np.float32))
        self._pose.append(np.asarray(pose_frame, np.float32))
        if len(self._pose) < self.seq_len:
            return None
        self._pose = self._pose[-self.seq_len :]
        self._sensor = self._sensor[-self.seq_len :]
        skel = np.stack(self._pose)[None]                 # (1, T, V, C)
        sensor = (
            np.stack(self._sensor)[None] if self._sensor else None
        )
        pred = int(self.predictor.predict(skel, sensor)[0])
        self._votes.append(pred)
        self._votes = self._votes[-self.smooth :]
        return int(np.bincount(self._votes).argmax())


def measure_push_latency(
    classifier: StreamingClassifier,
    n_pushes: int = 200,
    warmup: int = 20,
    n_joints: int = 14,
    in_channels: int = 3,
    sensor_dim: Optional[int] = None,
    seed: int = 0,
) -> Dict[str, float]:
    """Per-push latency of the streaming path (p50/p99/mean, ms).

    Pushes synthetic frames through ``classifier.push`` and times each call.
    ``predict`` fetches logit values to host, which is a true device sync on
    every platform (the axon remote-TPU ``block_until_ready`` returns early;
    value fetch is the reliable barrier — bench.py measurement notes).
    """
    import time

    rng = np.random.default_rng(seed)

    def frame():
        pose = rng.normal(size=(n_joints, in_channels)).astype(np.float32)
        sens = (
            rng.normal(size=(sensor_dim,)).astype(np.float32)
            if sensor_dim
            else None
        )
        return pose, sens

    classifier.reset()
    # fill the window + compile + warm the dispatch path
    for _ in range(classifier.seq_len + warmup):
        pose, sens = frame()
        classifier.push(pose, sens)

    samples = []
    for _ in range(n_pushes):
        pose, sens = frame()
        t0 = time.perf_counter()
        classifier.push(pose, sens)
        samples.append((time.perf_counter() - t0) * 1e3)
    arr = np.asarray(samples)
    return {
        "p50_ms": float(np.percentile(arr, 50)),
        "p90_ms": float(np.percentile(arr, 90)),
        "p99_ms": float(np.percentile(arr, 99)),
        "mean_ms": float(arr.mean()),
        "n": int(arr.size),
    }


def main(argv=None):
    """Serving CLI (new capability; the reference has no inference surface):

        python -m fall_multimodal_tpu.serve predict \
            --config gstcan_urfall_3stream --checkpoint outputs/run/ckpt \
            --input windows.npz --output predictions.csv [--batch-size 128] \
            [--num-copies 1] [--proba]

        python -m fall_multimodal_tpu.serve latency \
            --config gstcan_urfall_3stream --checkpoint outputs/run/ckpt \
            [--pushes 200] [--sensor-dim 4]

        python -m fall_multimodal_tpu.serve export \
            --config gstcan_urfall_3stream --checkpoint outputs/run/ckpt \
            --output model.stablehlo [--batch-size 128] [--sensor-dim 4]

    ``--input`` accepts an .npz with arrays ``skeleton`` (N,T,V,C) [and
    ``sensor`` (N,T,S)], a bare .npy of skeleton windows, or a prep-pipeline
    pickle (the ``data.prep windows`` output). ``--config`` also accepts the
    ``config.json`` a training run leaves in its output dir (YAML superset).
    """
    import argparse
    import csv

    from fall_multimodal_tpu.configs import load_config, preset_path
    import os

    p = argparse.ArgumentParser(prog="fall_multimodal_tpu.serve")
    sub = p.add_subparsers(dest="cmd", required=True)

    def common(s):
        s.add_argument("--config", required=True, help="preset name or YAML path")
        s.add_argument("--checkpoint", required=True,
                       help="checkpoint dir (orbax), or a reference torch "
                            "checkpoint file (.pt/.pth/.npz) converted via "
                            "interop")
        s.add_argument("--which", default="best", choices=["best", "latest"])
        s.add_argument("--batch-size", type=int, default=128)

    s = sub.add_parser("predict", help="batch inference over saved windows")
    common(s)
    s.add_argument("--input", required=True)
    s.add_argument("--output", default="predictions.csv")
    s.add_argument("--num-copies", type=int, default=1,
                   help="k-copies strided inference average (reference "
                        "Multimodal_Fall3/main.py:150-161)")
    s.add_argument("--proba", action="store_true",
                   help="also write per-class probabilities")

    s = sub.add_parser("latency", help="measure streaming p50/p99 push latency")
    common(s)
    s.add_argument("--pushes", type=int, default=200)
    s.add_argument("--sensor-dim", type=int, default=None)

    s = sub.add_parser(
        "export", help="serialize the eval forward to portable StableHLO"
    )
    common(s)
    s.add_argument("--output", default="model.stablehlo")
    s.add_argument("--sensor-dim", type=int, default=None)

    s = sub.add_parser(
        "serve", help="HTTP JSON prediction endpoint (GET /healthz, "
                      "POST /v1/predict)"
    )
    common(s)
    s.add_argument("--host", default="127.0.0.1")
    s.add_argument("--port", type=int, default=8000)
    s.add_argument("--num-copies", type=int, default=1)

    args = p.parse_args(argv)
    cfg_path = args.config if os.path.exists(args.config) else preset_path(args.config)
    cfg = load_config(cfg_path)

    # --checkpoint: orbax dir (ours) or a reference torch file (interop)
    torch_file = args.checkpoint.endswith((".pt", ".pth", ".npz"))

    def make_predictor(sample_skel, sample_sensor, **kw):
        if torch_file:
            return Predictor.from_torch_checkpoint(cfg, args.checkpoint, **kw)
        return Predictor.from_checkpoint(
            cfg, args.checkpoint, sample_skel, sample_sensor,
            which=args.which, **kw,
        )

    def load_input(path):
        if path.endswith(".npz"):
            blob = np.load(path)
            return blob["skeleton"], (blob["sensor"] if "sensor" in blob else None)
        if path.endswith(".npy"):
            return np.load(path), None
        from fall_multimodal_tpu.data import load_pickle_windows

        data = load_pickle_windows(path)
        return data.features, data.sensors

    if args.cmd == "predict":
        skeleton, sensor = load_input(args.input)
        if sensor is None and uses_sensor(cfg.model.name):
            # check before building the predictor: the checkpoint-restore
            # template would otherwise be initialized for a (N,1,1) sensor
            # and fail with an opaque orbax shape mismatch instead of this
            raise SystemExit(
                f"model {cfg.model.name!r} consumes the sensor stream but "
                f"{args.input!r} has no sensor array; provide an .npz with "
                "both 'skeleton' and 'sensor', or a prep-pipeline pickle"
            )
        sample_sensor = (
            sensor if sensor is not None
            else np.zeros((len(skeleton), 1, 1), np.float32)
        )
        pred = make_predictor(
            skeleton, sample_sensor,
            batch_size=args.batch_size, num_copies=args.num_copies,
        )
        proba = pred.predict_proba(skeleton, sensor)
        classes = proba.argmax(-1)
        with open(args.output, "w", newline="") as fh:
            writer = csv.writer(fh)
            header = ["index", "prediction"]
            if args.proba:
                header += [f"p{k}" for k in range(proba.shape[1])]
            writer.writerow(header)
            for i, c in enumerate(classes):
                row = [i, int(c)]
                if args.proba:
                    row += [f"{v:.6f}" for v in proba[i]]
                writer.writerow(row)
        print(f"wrote {args.output}: {len(classes)} predictions, "
              f"{proba.shape[1]} classes")
        return {"n": len(classes), "output": args.output}

    if args.cmd == "serve":
        from fall_multimodal_tpu.server import make_server

        d = cfg.data
        skel = np.zeros((2, d.seq_len, d.num_joints, d.in_channels), np.float32)
        sens = np.zeros((2, d.seq_len, d.sensor_dim), np.float32)
        pred = make_predictor(
            skel, sens, batch_size=args.batch_size, num_copies=args.num_copies,
        )
        # warm the compile before accepting traffic: first request should
        # pay request latency, not the 20-40 s XLA compile
        pred.predict_logits(skel[:1], sens[:1] if pred.requires_sensor else None)
        srv = make_server(pred, host=args.host, port=args.port, quiet=False)
        print(f"serving {cfg.model.name} on http://{srv.host}:{srv.port} "
              f"(POST /v1/predict, GET /healthz)", flush=True)
        srv.serve()
        return {"host": srv.host, "port": srv.port}

    if args.cmd == "export":
        sensor_dim = args.sensor_dim or cfg.data.sensor_dim
        skel = np.zeros(
            (2, cfg.data.seq_len, cfg.data.num_joints, cfg.data.in_channels),
            np.float32,
        )
        sens = np.zeros((2, cfg.data.seq_len, sensor_dim), np.float32)
        pred = make_predictor(skel, sens)
        blob = export_stablehlo(
            cfg,
            pred.variables,
            skeleton_shape=(args.batch_size,) + skel.shape[1:],
            sensor_shape=(args.batch_size,) + sens.shape[1:],
        )
        with open(args.output, "wb") as fh:
            fh.write(blob)
        print(f"wrote {args.output}: {len(blob)} StableHLO bytes "
              f"(batch {args.batch_size})")
        return {"bytes": len(blob), "output": args.output}

    # latency
    rng = np.random.default_rng(0)
    skel = rng.normal(
        size=(2, cfg.data.seq_len, cfg.data.num_joints, cfg.data.in_channels)
    ).astype(np.float32)
    sensor_dim = args.sensor_dim or cfg.data.sensor_dim
    sens = rng.normal(size=(2, cfg.data.seq_len, sensor_dim)).astype(np.float32)
    pred = make_predictor(skel, sens, batch_size=args.batch_size)
    stream = StreamingClassifier(pred, seq_len=cfg.data.seq_len)
    stats = measure_push_latency(
        stream, n_pushes=args.pushes,
        n_joints=cfg.data.num_joints, in_channels=cfg.data.in_channels,
        sensor_dim=sensor_dim if pred.requires_sensor else None,
    )
    import json as _json

    print(_json.dumps(stats))
    return stats


if __name__ == "__main__":
    main()
