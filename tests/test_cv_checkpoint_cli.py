"""CV driver, grid search, orbax checkpointing, and CLI smoke tests."""

import json
import os

import numpy as np
import pytest

from fall_multimodal_tpu.configs import load_config, preset_path
from fall_multimodal_tpu.data import make_synthetic, split_dataset, to_device
from fall_multimodal_tpu.models import build_model
from fall_multimodal_tpu.train import build_optimizer, create_train_state
from fall_multimodal_tpu.train.cv import cross_validate, grid_search, run_fold
from fall_multimodal_tpu.utils.checkpoint import Checkpointer


@pytest.fixture(scope="module")
def tiny_data():
    return make_synthetic(
        n_windows=120, num_classes=3, sensor_dim=6, windows_per_video=8,
        noise=0.05, seed=0,
    )


def _cfg(**over):
    base = {"data.num_classes": 3, "data.n_folds": 3}
    base.update(over)
    return load_config(preset_path("bilstm"), overrides=base)


def test_cross_validate_collects_per_fold_metrics(tiny_data):
    cfg = _cfg()
    results = cross_validate(cfg, tiny_data, n_folds=3, epochs=2)
    assert len(results["folds"]) == 3
    for row in results["folds"]:
        assert 0.0 <= row["test_accuracy"] <= 1.0
        assert "macro_f1" in row
    assert "test_accuracy_mean" in results["summary"]
    assert "macro_f1_std" in results["summary"]


def test_grid_search_keeps_grid_order_and_ranks(tiny_data):
    """Rows stay in grid-iteration order (the reference CSV's accumulation
    order, hyperparameter_tuning.py:461-471); ranking is a column."""
    cfg = _cfg()
    rows = grid_search(cfg, tiny_data, {"hidden_size": [8, 16]}, epochs=2)
    assert len(rows) == 2
    assert [r["hidden_size"] for r in rows] == [8, 16]  # grid order
    assert sorted(r["rank"] for r in rows) == [1, 2]
    best = min(rows, key=lambda r: r["rank"])
    assert best["val_accuracy"] == max(r["val_accuracy"] for r in rows)


def test_vmapped_cv_fold_smaller_than_half_batch(tiny_data):
    """Wraparound padding must tile the permutation as many times as the
    batch needs — a fold smaller than batch//2 once crashed the reshape."""
    from fall_multimodal_tpu.train.cv_vmapped import cross_validate_vmapped

    cfg = _cfg(**{"train.batch_size": 96})   # fold train ~= 80 < 96
    results = cross_validate_vmapped(cfg, tiny_data, n_folds=3, epochs=1)
    assert len(results["folds"]) == 3


def test_checkpoint_survives_crash_during_swap(tmp_path, tiny_data):
    """save must never delete the only resumable state before the new one
    commits; restore falls back to the moved-aside copy if a crash lands
    inside the swap."""
    import shutil

    cfg = _cfg()
    splits = {
        k: to_device(v) for k, v in split_dataset(tiny_data, seed=1).items()
    }
    model = build_model(cfg)
    optimizer = build_optimizer(cfg)
    state = create_train_state(
        model, optimizer, splits["train"].features[:2], splits["train"].sensors[:2]
    )
    ckpt = Checkpointer(str(tmp_path / "ckpt"))
    ckpt.save_latest(state, epoch=1, best_acc=0.5)
    ckpt.save_latest(state, epoch=2, best_acc=0.6)      # overwrite path
    _, epoch, best = ckpt.restore("latest", state)
    assert epoch == 2 and best == pytest.approx(0.6)
    # simulate a crash between the two renames: final missing, .prev present
    final = os.path.join(str(tmp_path / "ckpt"), "latest")
    shutil.move(final, final + ".prev")
    assert ckpt.has("latest")
    _, epoch, best = ckpt.restore("latest", state)
    assert epoch == 2 and best == pytest.approx(0.6)


def test_checkpoint_roundtrip(tmp_path, tiny_data):
    cfg = _cfg()
    splits = {
        k: to_device(v)
        for k, v in split_dataset(tiny_data, seed=1).items()
    }
    model = build_model(cfg)
    optimizer = build_optimizer(cfg)
    state = create_train_state(
        model, optimizer, splits["train"].features[:2], splits["train"].sensors[:2]
    )
    ckpt = Checkpointer(str(tmp_path / "ckpt"))
    ckpt.save_best(state, epoch=5, best_acc=0.75)
    assert ckpt.has("best")
    template = create_train_state(
        model, optimizer, splits["train"].features[:2], splits["train"].sensors[:2],
        seed=99,
    )
    restored, epoch, best = ckpt.restore("best", template)
    assert epoch == 5 and best == pytest.approx(0.75)
    import jax

    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(restored.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_fit_with_checkpointer_saves_best_and_latest(tmp_path, tiny_data):
    cfg = _cfg()
    splits = {
        k: to_device(v) for k, v in split_dataset(tiny_data, seed=1).items()
    }
    ckpt = Checkpointer(str(tmp_path / "ck"))
    run_fold(cfg, splits, epochs=2, checkpointer=ckpt)
    assert ckpt.has("best")
    assert ckpt.has("latest")


def test_cli_end_to_end(tmp_path):
    from fall_multimodal_tpu.cli import main

    out = str(tmp_path / "run")
    result = main([
        "--config", "bilstm",
        "--set", "data.num_classes=3",
        "--epochs", "2",
        "--output-dir", out,
        "--synthetic-windows", "96",
    ])
    assert "test_accuracy" in result
    assert os.path.exists(os.path.join(out, "history.json"))
    assert os.path.exists(os.path.join(out, "report.txt"))
    assert os.path.exists(os.path.join(out, "config.json"))
    hist = json.load(open(os.path.join(out, "history.json")))
    assert len(hist["train_loss"]) == 2

    # test-only path restores the saved best checkpoint
    result2 = main([
        "--config", "bilstm",
        "--set", "data.num_classes=3",
        "--output-dir", out,
        "--synthetic-windows", "96",
        "--test-only",
    ])
    assert "test_accuracy" in result2


def test_cli_rejects_conflicting_mode_flags(tmp_path):
    """--resume/--pretrained/--test-only are single-split-path flags; the
    CV and grid drivers would silently ignore them (retraining every fold
    from scratch) — they must fail loudly. --epochs 0 likewise must not be
    silently dropped by a falsy check. Malformed --grid JSON gets the clean
    SystemExit, not an AttributeError/TypeError traceback."""
    import pytest

    from fall_multimodal_tpu.cli import main

    base = ["--config", "bilstm", "--output-dir", str(tmp_path / "x")]
    for extra in (
        ["--cv", "--resume", "somewhere"],
        ["--cv-vmapped", "--pretrained", "somewhere"],
        ["--grid", "--resume", "somewhere"],
        ["--cv", "--test-only"],
        ["--epochs", "0"],
        ["--grid", "[16, 32]"],
        ["--grid", '{"embed_dim": 16}'],
    ):
        with pytest.raises(SystemExit):
            main(base + extra)


def test_json_safe_history_encodes_nan_as_null():
    import json as json_mod

    from fall_multimodal_tpu.cli import _json_safe_history

    safe = _json_safe_history({"train_loss": [0.5, float("nan")],
                               "val_acc": [0.3, 0.4]})
    text = json_mod.dumps(safe)
    assert "NaN" not in text
    assert json_mod.loads(text)["train_loss"] == [0.5, None]


def test_fold_history_csv_keeps_all_columns_after_nan_break(tmp_path):
    """After fit()'s NaN guard breaks mid-epoch, train_loss is one entry
    longer than the other series; the fold artifact must keep every curve
    (padding the short ones) instead of silently writing train_loss only."""
    import csv
    import types

    from fall_multimodal_tpu.train.cv import _write_fold_artifacts

    # fit()'s exact history schema (loop.py builds these five series)
    result = types.SimpleNamespace(
        history={
            "train_loss": [0.9, 0.5, float("nan")],
            "train_acc": [0.3, 0.6],
            "val_loss": [1.0, 0.8],
            "val_acc": [0.2, 0.5],
            "epoch_time": [0.1, 0.1],
        },
        test=None,
    )
    _write_fold_artifacts(str(tmp_path), 0, result)
    with open(tmp_path / "fold0" / "history.csv") as fh:
        rows = list(csv.reader(fh))
    assert rows[0] == [
        "epoch", "train_loss", "train_acc", "val_loss", "val_acc",
        "epoch_time",
    ]
    assert len(rows) == 4                       # header + 3 epochs
    assert rows[2][2] == "0.6"                  # curves present
    assert rows[3][1] == "nan" and rows[3][2] == ""


def test_cli_accum_iter_trains_and_restores(tmp_path):
    """train.accum_iter must reach the training optimizer (run_fold once
    dropped it, training without accumulation) AND the saved opt_state must
    restore through --test-only, which rebuilds the optimizer from the full
    Config (MultiSteps-wrapped) — a mismatch fails the orbax restore."""
    from fall_multimodal_tpu.cli import main

    out = str(tmp_path / "run")
    args = [
        "--config", "bilstm",
        "--set", "data.num_classes=3",
        "--set", "train.accum_iter=2",
        "--output-dir", out,
        "--synthetic-windows", "96",
    ]
    result = main(args + ["--epochs", "2"])
    assert "test_accuracy" in result
    result2 = main(args + ["--test-only"])
    assert "test_accuracy" in result2


def test_cli_cv_mode(tmp_path):
    from fall_multimodal_tpu.cli import main

    out = str(tmp_path / "cv")
    result = main([
        "--config", "bilstm",
        "--set", "data.num_classes=3",
        "--epochs", "1",
        "--folds", "2",
        "--cv",
        "--output-dir", out,
        "--synthetic-windows", "64",
    ])
    assert len(result["folds"]) == 2
    assert os.path.exists(os.path.join(out, "cv_results.json"))


def test_cli_grid_mode(tmp_path):
    """--grid runs the hyperparameter search (reference
    hyperparameter_tuning.py surface) and writes the accumulated CSV."""
    from fall_multimodal_tpu.cli import main

    out = str(tmp_path / "grid")
    result = main([
        "--config", "bilstm",
        "--set", "data.num_classes=3",
        "--epochs", "1",
        "--grid", '{"hidden_size": [8, 16]}',
        "--output-dir", out,
        "--synthetic-windows", "64",
    ])
    rows = result["grid"]
    assert len(rows) == 2
    assert [r["hidden_size"] for r in rows] == [8, 16]  # grid order kept
    assert all("val_accuracy" in r and "test_accuracy" in r for r in rows)
    assert sorted(r["rank"] for r in rows) == [1, 2]
    csv_path = os.path.join(out, "grid_results.csv")
    assert os.path.exists(csv_path)
    header = open(csv_path).readline().strip().split(",")
    assert "hidden_size" in header and "val_accuracy" in header
    assert "rank" in header


def test_vmapped_cv_matches_sequential_quality(tiny_data):
    """All-folds-at-once vmapped CV must produce the same result structure
    and learn comparably to the sequential driver."""
    from fall_multimodal_tpu.train.cv_vmapped import cross_validate_vmapped

    cfg = _cfg()
    results = cross_validate_vmapped(cfg, tiny_data, n_folds=3, epochs=4)
    assert len(results["folds"]) == 3
    for row in results["folds"]:
        assert 0.0 <= row["test_accuracy"] <= 1.0
        assert 0.0 <= row["macro_f1"] <= 1.0
    assert "test_accuracy_mean" in results["summary"]
    # synthetic data is separable: parallel folds must actually learn
    assert results["summary"]["test_accuracy_mean"] > 0.5


def test_resume_training_continues_from_latest(tmp_path, tiny_data):
    """Reference RESUME_FROM capability: restore latest state and continue
    at the saved epoch."""
    cfg = _cfg()
    splits = {k: to_device(v) for k, v in split_dataset(tiny_data, seed=1).items()}
    ckpt = Checkpointer(str(tmp_path / "r"))
    first = run_fold(cfg, splits, epochs=2, checkpointer=ckpt)
    resumed = run_fold(cfg, splits, epochs=4, checkpointer=ckpt,
                       resume_from=str(tmp_path / "r"))
    # only epochs 3 and 4 ran in the resumed fit
    assert len(resumed.history["train_loss"]) == 2
    assert int(resumed.state.step) > int(first.state.step)


def test_pretrained_weights_load(tmp_path, tiny_data):
    cfg = _cfg()
    splits = {k: to_device(v) for k, v in split_dataset(tiny_data, seed=1).items()}
    ckpt = Checkpointer(str(tmp_path / "p"))
    run_fold(cfg, splits, epochs=2, checkpointer=ckpt)
    warm = run_fold(cfg, splits, epochs=1, pretrained_path=str(tmp_path / "p"))
    cold = run_fold(cfg, splits, epochs=1)
    # warm start from trained weights should not be worse at epoch 1
    assert warm.history["train_loss"][0] <= cold.history["train_loss"][0] + 0.1


def test_resume_tests_best_not_latest_when_no_improvement(tmp_path, tiny_data):
    """ADVICE r1 (medium): on resume, if no post-resume epoch beats the
    saved best accuracy, the final test must run on the restored *best*
    checkpoint, not the restored latest state (reference reloads best
    before testing, main.py:344)."""
    import jax

    cfg = _cfg()
    splits = {k: to_device(v) for k, v in split_dataset(tiny_data, seed=1).items()}
    ckpt = Checkpointer(str(tmp_path / "rb"))
    first = run_fold(cfg, splits, epochs=2, checkpointer=ckpt)

    # Rewrite "best" with sentinel params and an unbeatable accuracy so the
    # resumed epoch cannot improve on it; "latest" keeps the real weights.
    sentinel = first.state._replace(
        params=jax.tree.map(lambda x: x * 0 + 7.0, first.state.params)
    )
    ckpt.save_best(sentinel, epoch=2, best_acc=2.0)
    ckpt.save_latest(first.state, epoch=2, best_acc=2.0)

    resumed = run_fold(cfg, splits, epochs=3, resume_from=str(tmp_path / "rb"))
    assert resumed.best_val_accuracy == pytest.approx(2.0)
    for leaf in jax.tree.leaves(resumed.best_state.params):
        np.testing.assert_allclose(np.asarray(leaf), 7.0)


def test_vmapped_cv_protocol_delta_bounded(tiny_data):
    """VERDICT r1 item 8: cv_vmapped subsamples larger folds to the smallest
    fold's steps/epoch. Bound the resulting quality delta against the
    sequential driver on the same data and seed, and record it (PARITY.md)."""
    from fall_multimodal_tpu.train.cv_vmapped import cross_validate_vmapped

    cfg = _cfg()
    seq = cross_validate(cfg, tiny_data, n_folds=3, epochs=6)
    par = cross_validate_vmapped(cfg, tiny_data, n_folds=3, epochs=6)
    a = seq["summary"]["test_accuracy_mean"]
    b = par["summary"]["test_accuracy_mean"]
    # same data, same seeds, same fold protocol; the only difference is the
    # per-epoch subsampling of larger folds. On this separable synthetic
    # set both drivers must learn to within a few accuracy points.
    assert abs(a - b) <= 0.08, (a, b)
    f1a = seq["summary"]["macro_f1_mean"]
    f1b = par["summary"]["macro_f1_mean"]
    assert abs(f1a - f1b) <= 0.10, (f1a, f1b)


# ---------------------------------------------------------------------------
# Round-3 driver capabilities: --mesh, CV artifacts, flags on all paths
# ---------------------------------------------------------------------------

def test_cli_mesh_end_to_end(tmp_path):
    """The VERDICT r2 contract: `--mesh N` trains end-to-end data-parallel
    on the virtual mesh through the standard CLI driver."""
    from fall_multimodal_tpu.cli import main

    out = str(tmp_path / "mesh_run")
    result = main([
        "--config", "bilstm",
        "--set", "data.num_classes=3",
        "--set", "train.epoch_impl=host",
        "--epochs", "2",
        "--mesh", "8",
        "--output-dir", out,
        "--synthetic-windows", "96",
    ])
    assert "test_accuracy" in result
    hist = json.load(open(os.path.join(out, "history.json")))
    assert len(hist["train_loss"]) == 2
    assert all(np.isfinite(v) for v in hist["train_loss"])


def test_cli_test_only_mesh(tmp_path):
    """--test-only --mesh N: best checkpoint restored, state replicated,
    eval sharded across the mesh (cli.py's mesh branch of the test-only
    path) — and the accuracy matches the single-device test-only run."""
    from fall_multimodal_tpu.cli import main

    out = str(tmp_path / "run")
    main([
        "--config", "bilstm",
        "--set", "data.num_classes=3",
        "--epochs", "1",
        "--output-dir", out,
        "--synthetic-windows", "96",
    ])
    single = main([
        "--config", "bilstm",
        "--set", "data.num_classes=3",
        "--output-dir", out,
        "--synthetic-windows", "96",
        "--test-only",
    ])
    meshed = main([
        "--config", "bilstm",
        "--set", "data.num_classes=3",
        "--output-dir", out,
        "--synthetic-windows", "96",
        "--test-only",
        "--mesh", "8",
    ])
    assert meshed["test_accuracy"] == pytest.approx(
        single["test_accuracy"], abs=1e-6)


def test_cli_cv_emits_fold_artifacts(tmp_path):
    """--cv leaves the notebook loop's per-fold artifacts: confusion.png +
    history.csv (GSTCAN_HAR_conv_10kfold.ipynb:7)."""
    pytest.importorskip("matplotlib")
    from fall_multimodal_tpu.cli import main

    out = str(tmp_path / "cv_art")
    main([
        "--config", "bilstm",
        "--set", "data.num_classes=3",
        "--epochs", "2",
        "--folds", "2",
        "--cv",
        "--output-dir", out,
        "--synthetic-windows", "64",
    ])
    for fold in (0, 1):
        assert os.path.exists(os.path.join(out, f"fold{fold}", "confusion.png"))
        csv_path = os.path.join(out, f"fold{fold}", "history.csv")
        assert os.path.exists(csv_path)
        lines = open(csv_path).read().strip().splitlines()
        assert lines[0].startswith("epoch,")
        assert len(lines) == 3  # header + 2 epochs


def test_cli_grad_norms_on_cv_path(tmp_path, monkeypatch):
    """--grad-norms is wired (not warned away) on the --cv path: per-fold
    per-step scalars reach the TensorBoard writer."""
    from fall_multimodal_tpu import cli

    seen = []

    class FakeWriter:
        def __init__(self, log_dir=None):
            self.closed = False

        def close(self):
            self.closed = True

        def add_scalar(self, name, value, step):
            seen.append((name, step))

    import torch.utils.tensorboard as tb

    monkeypatch.setattr(tb, "SummaryWriter", FakeWriter)
    out = str(tmp_path / "cv_gn")
    cli.main([
        "--config", "bilstm",
        "--set", "data.num_classes=3",
        "--epochs", "1",
        "--folds", "2",
        "--cv",
        "--grad-norms",
        "--output-dir", out,
        "--synthetic-windows", "64",
    ])
    fold_tags = {n.split("/")[0] for n, _ in seen if n.startswith("fold")}
    assert {"fold0", "fold1"} <= fold_tags
    assert any("grad_norm/" in n for n, _ in seen)


def test_vmapped_cv_honors_dtype_and_epoch_impl(tiny_data):
    """train.dtype=bfloat16 and epoch_impl=host drive the vmapped CV path
    (round-2 weakness: fold-parallel CV was always f32 scan)."""
    from fall_multimodal_tpu.train.cv_vmapped import cross_validate_vmapped

    cfg = _cfg(**{"train.dtype": "bfloat16", "train.epoch_impl": "host"})
    results = cross_validate_vmapped(cfg, tiny_data, n_folds=2, epochs=2)
    assert len(results["folds"]) == 2
    for row in results["folds"]:
        assert 0.0 <= row["test_accuracy"] <= 1.0


def test_vmapped_cv_grad_norms_stream(tiny_data):
    from fall_multimodal_tpu.train.cv_vmapped import cross_validate_vmapped

    per_fold = {0: [], 1: []}

    def factory(fold):
        def cb(step, scalars):
            per_fold[fold].append(step)
            assert any(k.startswith("grad_norm/") for k in scalars)
        return cb

    cfg = _cfg()
    cross_validate_vmapped(
        cfg, tiny_data, n_folds=2, epochs=2, grad_norms=True,
        step_metrics_factory=factory,
    )
    assert per_fold[0] and per_fold[0] == sorted(per_fold[0])
    assert per_fold[1] == per_fold[0]


def test_cli_bad_set_key_fails_loudly(tmp_path):
    from fall_multimodal_tpu.cli import main

    with pytest.raises(SystemExit) as exc:
        main([
            "--config", "bilstm",
            "--set", "optim.learning_rate=1e-3",  # not a valid key
            "--output-dir", str(tmp_path / "bad"),
        ])
    msg = str(exc.value)
    assert "learning_rate" in msg and "lr" in msg  # names the valid keys


def test_cli_cv_mesh_without_vmapped_rejected(tmp_path):
    from fall_multimodal_tpu.cli import main

    with pytest.raises(SystemExit):
        main([
            "--config", "bilstm",
            "--set", "data.num_classes=3",
            "--cv",
            "--cv-mesh", "4",
            "--output-dir", str(tmp_path / "x"),
            "--synthetic-windows", "64",
        ])
    with pytest.raises(SystemExit):
        main([
            "--config", "bilstm",
            "--set", "data.num_classes=3",
            "--cv-vmapped",
            "--mesh", "4",
            "--output-dir", str(tmp_path / "y"),
            "--synthetic-windows", "64",
        ])


def test_host_epoch_zero_steps_degrades_to_nan(tiny_data):
    """A zero-step epoch (train n < batch) returns NaN metrics matching the
    scan impl, so fit()'s nan_guard catches it instead of a TypeError."""
    from fall_multimodal_tpu.data import split_dataset
    from fall_multimodal_tpu.models import build_model as bm
    from fall_multimodal_tpu.train import build_optimizer as bo
    from fall_multimodal_tpu.train.loop import make_train_epoch

    import jax.numpy as jnp

    cfg = _cfg()
    splits = {k: to_device(v) for k, v in split_dataset(tiny_data, seed=1).items()}
    model = bm(cfg)
    optimizer = bo(cfg)
    state = create_train_state(
        model, optimizer, splits["train"].features[:2], splits["train"].sensors[:2]
    )
    epoch = make_train_epoch(model, optimizer, impl="host")
    idx = jnp.zeros((0, 16), jnp.int32)
    state2, metrics = epoch(state, splits["train"], idx)
    assert np.isnan(float(metrics["loss"]))
    assert np.isnan(float(metrics["accuracy"]))


def test_cli_profile_writes_trace(tmp_path):
    """--profile captures a jax.profiler trace under <out>/profile."""
    from fall_multimodal_tpu.cli import main

    out = str(tmp_path / "prof")
    main([
        "--config", "bilstm",
        "--set", "data.num_classes=3",
        "--epochs", "1",
        "--profile",
        "--output-dir", out,
        "--synthetic-windows", "64",
    ])
    prof_dir = os.path.join(out, "profile")
    assert os.path.isdir(prof_dir)
    # the trace writes plugins/profile/<ts>/*.pb (or .trace.json.gz)
    found = []
    for root, _, files in os.walk(prof_dir):
        found.extend(files)
    assert found, "no profiler artifacts written"


def test_cli_tensorboard_on_cv_path(tmp_path, monkeypatch):
    """--tensorboard streams per-fold EPOCH curves on --cv (round-3 review:
    the writer used to be created but never fed on the CV/grid paths)."""
    from fall_multimodal_tpu import cli

    seen = []

    class FakeWriter:
        def __init__(self, log_dir=None):
            self.closed = False

        def close(self):
            self.closed = True

        def add_scalar(self, name, value, step):
            seen.append((name, step))

    import torch.utils.tensorboard as tb

    monkeypatch.setattr(tb, "SummaryWriter", FakeWriter)
    cli.main([
        "--config", "bilstm",
        "--set", "data.num_classes=3",
        "--epochs", "2",
        "--folds", "2",
        "--cv",
        "--tensorboard",
        "--output-dir", str(tmp_path / "cv_tb"),
        "--synthetic-windows", "64",
    ])
    for fold in ("fold0", "fold1"):
        for curve in ("train_loss", "val_accuracy"):
            epochs = sorted(s for n, s in seen if n == f"{fold}/{curve}")
            assert epochs == [1, 2], (fold, curve, epochs)


def test_vmapped_cv_epoch_metrics_factory(tiny_data):
    """metrics_factory(fold) receives per-epoch train/val scalars from the
    vmapped CV driver (the fit() metrics_callback contract per fold)."""
    from fall_multimodal_tpu.train.cv_vmapped import cross_validate_vmapped

    per_fold = {0: [], 1: []}

    def factory(fold):
        def cb(epoch, scalars):
            assert {"train_loss", "train_accuracy",
                    "val_loss", "val_accuracy"} <= set(scalars)
            assert all(np.isfinite(v) for v in scalars.values())
            per_fold[fold].append(epoch)
        return cb

    cross_validate_vmapped(
        _cfg(), tiny_data, n_folds=2, epochs=2, metrics_factory=factory,
    )
    assert per_fold[0] == [1, 2] and per_fold[1] == [1, 2]


def test_cli_bad_set_value_fails_loudly(tmp_path):
    """Uncoercible values and nested overrides onto scalar fields exit with
    the 'invalid config override' message, not a raw traceback."""
    from fall_multimodal_tpu.cli import main

    for bad in ("optim.lr=not_a_number", "optim.lr.min=1"):
        with pytest.raises(SystemExit) as exc:
            main([
                "--config", "bilstm",
                "--set", bad,
                "--output-dir", str(tmp_path / "bad_value"),
            ])
        assert "invalid config override" in str(exc.value)


def test_cli_bad_config_file_not_blamed_on_overrides(tmp_path):
    """An uncoercible value inside the YAML itself is reported as a config-
    FILE error naming the path — never as an 'invalid config override'
    (round-3 review: a bad preset used to point users at --set flags they
    never passed)."""
    from fall_multimodal_tpu.cli import main

    bad_yaml = tmp_path / "bad.yaml"
    bad_yaml.write_text("model:\n  name: bilstm\noptim:\n  lr: not_a_number\n")
    with pytest.raises(SystemExit) as exc:
        main(["--config", str(bad_yaml),
              "--output-dir", str(tmp_path / "out")])
    msg = str(exc.value)
    assert "invalid config file" in msg and "bad.yaml" in msg
    assert "override" not in msg
    # ... even when --set overrides are ALSO present
    with pytest.raises(SystemExit) as exc:
        main(["--config", str(bad_yaml), "--set", "optim.momentum=0.9",
              "--output-dir", str(tmp_path / "out2")])
    assert "invalid config file" in str(exc.value)


def test_cli_grid_tensorboard_uses_point_prefix(tmp_path, monkeypatch):
    """--grid tags TB curves point{i}/, not fold{i} — a grid run and a CV
    run in one TB instance must stay distinguishable (round-3 review)."""
    from fall_multimodal_tpu import cli

    seen = []

    class FakeWriter:
        def __init__(self, log_dir=None):
            self.closed = False

        def close(self):
            self.closed = True

        def add_scalar(self, name, value, step):
            seen.append(name)

    import torch.utils.tensorboard as tb

    monkeypatch.setattr(tb, "SummaryWriter", FakeWriter)
    cli.main([
        "--config", "bilstm",
        "--set", "data.num_classes=3",
        "--epochs", "1",
        "--grid", '{"hidden_size": [8, 16]}',
        "--tensorboard",
        "--output-dir", str(tmp_path / "grid_tb"),
        "--synthetic-windows", "64",
    ])
    points = {n.split("/")[0] for n in seen if "/" in n}
    assert points == {"point0", "point1"}, points
    assert not any(n.startswith("fold") for n in seen)


def test_cli_flag_conflicts_rejected_before_data_load(monkeypatch):
    """Pure-argument conflicts exit before any dataset/config work."""
    from fall_multimodal_tpu import cli

    def boom(*a, **k):  # pragma: no cover - must not be reached
        raise AssertionError("config was loaded before flag validation")

    monkeypatch.setattr(cli, "load_cli_config", boom)
    with pytest.raises(SystemExit):
        cli.main(["--config", "bilstm", "--cv", "--cv-mesh", "4"])
    with pytest.raises(SystemExit):
        cli.main(["--config", "bilstm", "--cv-vmapped", "--mesh", "4"])
