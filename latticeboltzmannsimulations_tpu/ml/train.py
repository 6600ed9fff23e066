"""Surrogate training: optax/flax re-build of the reference Keras pipeline
(common structure of ``CNN_*.py``: load .npy -> scale -> fnet assembly ->
80/20 split -> per-component model -> RMSprop/Adam + MSE -> save weights +
loss-history plot; fine-tuning driver = ``CNN_test.py`` capability).

TPU-first notes: data stays on device between steps, the update is one jitted
function, and inputs are NHWC so convolutions land on the MXU.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import serialization

from .datagen import DatasetArrays
from .models import CNNPreset, PRESETS, make_model
from .scaling import MaxScaler, MinMaxScaler


# ---------------------------------------------------------------------------
# Input assembly (reference: CNNEight_384/CNN_Eight.py:19-99)
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class PreparedData:
    fnet: np.ndarray          # (N, H, W, 10) scaled feq planes + Re plane
    aux: Optional[np.ndarray]  # (N, H, W, 2) lid-BC velocity planes or None
    targets: Dict[str, np.ndarray]  # component -> (N, H, W, 1) scaled
    scalers: Dict[str, dict]  # serializable scaler state
    u_lid: float


def _make_scalers(preset: CNNPreset):
    if preset.scaling == "max":
        return {k: MaxScaler() for k in ("re", "feq", "vel")}
    rng = preset.scale_range
    if preset.scaling == "minmax":
        return {"re": MinMaxScaler(rng), "feq": None, "vel": None}
    if preset.scaling == "minmax_all":
        return {k: MinMaxScaler(rng) for k in ("re", "feq", "vel")}
    raise ValueError(preset.scaling)


def prepare_inputs(ds: DatasetArrays, preset: CNNPreset,
                   u_lid: float = 0.08) -> PreparedData:
    """Scale and assemble the network inputs.

    fnet = concat(feq_initial broadcast over runs [9ch], Re plane [1ch]);
    aux = lid-row velocity planes velBCx/velBCy (zero except the lid row)
    (reference: ``CNN_Eight.py:23-25,86-91``).

    Quarantined (diverged, zero-filled) cavities are dropped here so they
    can never reach training regardless of how the dataset was assembled.
    """
    from .datagen import drop_failed

    ds = drop_failed(ds)
    n = len(ds.re_range)
    scalers = _make_scalers(preset)

    feq = np.transpose(ds.feq_initial, (1, 2, 0))       # (H, W, 9)
    if scalers["feq"] is not None:
        feq = scalers["feq"].fit_transform(feq)
    re_scaled = scalers["re"].fit_transform(
        np.asarray(ds.re_range, np.float64)
    ).astype(np.float32)

    h, w = feq.shape[:2]
    fnet = np.empty((n, h, w, 10), np.float32)
    fnet[..., :9] = feq[None]
    fnet[..., 9] = re_scaled[:, None, None]

    vel = np.transpose(ds.u_final, (0, 2, 3, 1))        # (N, H, W, 2)
    if scalers["vel"] is not None:
        vel = scalers["vel"].fit_transform(vel)
    targets = {"x": vel[..., :1], "y": vel[..., 1:2]}

    aux = None
    if preset.aux_bc_at_input or preset.aux_bc_at_head:
        bc = np.zeros((h, w, 2), np.float32)
        bc[:, 0, 0] = u_lid  # lid row (y index 0), x-velocity
        if scalers["vel"] is not None:
            bc = scalers["vel"].transform(bc)
        aux = np.broadcast_to(bc, (n, h, w, 2)).copy()

    return PreparedData(
        fnet=fnet, aux=aux, targets=targets,
        scalers={k: (s.to_dict() if s is not None else None)
                 for k, s in scalers.items()},
        u_lid=u_lid,
    )


def train_val_split(n: int, val_frac: float = 0.2, seed: int = 4):
    """Deterministic shuffle split (reference: train_test_split
    ``random_state=4``, ``CNN_Eight.py:98``)."""
    perm = np.random.default_rng(seed).permutation(n)
    n_val = max(1, int(round(n * val_frac)))
    return perm[n_val:], perm[:n_val]


# ---------------------------------------------------------------------------
# Training loop
# ---------------------------------------------------------------------------

def _optimizer(preset: CNNPreset, lr, schedule: Optional[str] = None,
               total_steps: int = 0, clip_norm: Optional[float] = None):
    """``schedule``: None (constant) | 'cosine' (decay to lr/100 over the
    run) | 'plateau' (staircase: /5 at 50% and 80% of the run) | 'inverse'
    or 'inverse:<rate>' (Keras-style inverse-time decay
    lr/(1 + rate*step), rate defaulting to 0.02 — the reference's
    early-model recipe, e.g. ``CNNThree_192/CNN_Three.py:106``
    ``RMSprop(lr=1e-4, decay=0.02)``; ``CNN_test.py`` retrains use
    decay 0.04, i.e. 'inverse:0.04').
    ``clip_norm``: global-norm gradient clipping (stabilises raw-scaled
    presets like cnn_three whose early gradients can blow up at lr 1e-3)."""
    if schedule == "cosine":
        lr = optax.cosine_decay_schedule(lr, max(1, total_steps), alpha=0.01)
    elif schedule == "plateau":
        lr = optax.piecewise_constant_schedule(
            lr, {int(total_steps * 0.5): 0.2, int(total_steps * 0.8): 0.2})
    elif schedule == "inverse" or (
        schedule is not None and schedule.startswith("inverse:")
    ):
        rate = float(schedule.split(":", 1)[1]) if ":" in schedule else 0.02
        lr0 = float(lr)
        lr = lambda step: lr0 / (1.0 + rate * step)  # noqa: E731
    elif schedule is not None:
        raise ValueError(f"unknown lr schedule {schedule!r}")
    base = optax.adam(lr) if preset.optimizer == "adam" else optax.rmsprop(lr)
    if clip_norm is not None:
        return optax.chain(optax.clip_by_global_norm(clip_norm), base)
    return base


@dataclasses.dataclass
class TrainResult:
    params: dict
    history: dict           # {"loss": [...], "val_loss": [...]}
    preset: CNNPreset
    component: str


def train(
    preset_name: str,
    data: PreparedData,
    component: str = "x",
    epochs: Optional[int] = None,
    batch_size: Optional[int] = None,
    learning_rate: float = 1e-3,
    seed: int = 0,
    init_params: Optional[dict] = None,
    verbose: bool = False,
    optimizer: Optional[str] = None,
    schedule: Optional[str] = None,
    clip_norm: Optional[float] = None,
    checkpoint_path: Optional[str] = None,
    checkpoint_every: int = 25,
    mesh: Optional[jax.sharding.Mesh] = None,
    kernel_init: str = "lecun_normal",
) -> TrainResult:
    """Train one velocity-component surrogate.  Pass ``init_params`` to
    fine-tune from saved weights at a lower LR (the ``CNN_test.py``
    capability, reference: ``CNN_test.py:100-106``).

    ``optimizer`` overrides the preset's choice ('rmsprop' | 'adam').
    Measured on TPU at native 384²: optax RMSprop plateaus at the
    mean-predictor MSE for every LR probed (1e-4..1e-3) while Adam
    descends normally, so full-resolution runs should pass 'adam'.

    ``checkpoint_path`` enables mid-run resume: every ``checkpoint_every``
    epochs the params, optimizer state (including any lr-schedule step
    count) and history are written atomically; a restarted call with the
    same arguments continues from the stored epoch with the identical
    shuffle trajectory.  This is what lets the relay-wedge watchdog restart
    a multi-hour TPU training leg without losing it.

    ``mesh`` enables data-parallel training over a device mesh (the scale
    axis the reference's single-GPU Keras never had): each minibatch is
    sharded over the mesh's first axis, parameters and optimizer state are
    replicated, and XLA inserts the gradient all-reduce over ICI.
    ``batch_size`` must divide evenly over that axis.  The minibatch
    schedule is identical to the single-device run, so results match it up
    to float reduction order."""
    preset = PRESETS[preset_name]
    if optimizer is not None:
        preset = dataclasses.replace(preset, optimizer=optimizer)
    # 'glorot_uniform' reproduces the Keras 2.x Conv/ConvTranspose default
    # for init-controlled reference-parity runs (see models.CavityCNN).
    model = make_model(preset_name, kernel_init=kernel_init)
    from .models import check_grid

    check_grid(preset, data.fnet.shape[1], data.fnet.shape[2])
    epochs = preset.epochs if epochs is None else epochs
    batch_size = preset.batch_size if batch_size is None else batch_size

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        dp = mesh.shape[mesh.axis_names[0]]
        if batch_size % dp:
            raise ValueError(
                f"data-parallel batch_size {batch_size} must divide over "
                f"the mesh's first axis ({dp} devices)")
        _shard_b = NamedSharding(mesh, PartitionSpec(mesh.axis_names[0]))
        _shard_r = NamedSharding(mesh, PartitionSpec())
        put_batch = lambda a: jax.device_put(a, _shard_b)  # noqa: E731
        put_repl = lambda t: jax.device_put(t, _shard_r)  # noqa: E731
    else:
        put_batch = put_repl = lambda t: t  # noqa: E731

    x = jnp.asarray(data.fnet)
    aux = jnp.asarray(data.aux) if data.aux is not None else None
    y = jnp.asarray(data.targets[component])
    tr_idx, va_idx = train_val_split(len(x))

    rng = jax.random.PRNGKey(seed)
    if init_params is None:
        args = (x[:1],) if aux is None else (x[:1], aux[:1])
        params = model.init(rng, *args)["params"]
    else:
        params = init_params
    tx = _optimizer(preset, learning_rate, schedule=schedule,
                    total_steps=max(1, len(tr_idx) // batch_size) * epochs,
                    clip_norm=clip_norm)
    params = put_repl(params)
    opt_state = put_repl(tx.init(params))

    def loss_fn(p, xb, auxb, yb):
        pred = model.apply({"params": p}, xb) if auxb is None else \
            model.apply({"params": p}, xb, auxb)
        return jnp.mean((pred - yb) ** 2)

    @jax.jit
    def update(p, o, xb, auxb, yb):
        loss, grads = jax.value_and_grad(loss_fn)(p, xb, auxb, yb)
        updates, o = tx.update(grads, o, p)
        return optax.apply_updates(p, updates), o, loss

    eval_loss = jax.jit(loss_fn)

    history = {"loss": [], "val_loss": []}
    steps_per_epoch = max(1, len(tr_idx) // batch_size)
    shuffle_rng = np.random.default_rng(seed)
    va = jnp.asarray(va_idx)
    vaux = None if aux is None else aux[va]

    # The recipe fingerprint pins a checkpoint to the exact training run
    # that wrote it: without it, a *completed* run's final checkpoint (same
    # path, different lr/schedule/budget later) would resume at
    # start_epoch >= epochs — zero training — and silently return the old
    # recipe's params labeled as the new one's.  The epoch budget is part
    # of the fingerprint only for schedules shaped by it (cosine/plateau);
    # constant and inverse-time lr are budget-independent, so a killed
    # 600-epoch leg may legitimately resume under any larger budget.
    # Dataset identity belongs in the fingerprint too: a checkpoint written
    # against one dataset must never resume against another (e.g. a partial
    # --assemble-partial training set later replaced by the full sweep —
    # same recipe, but different n, shuffle universe and epoch accounting).
    # Sample count + grid shape + a strided center-pixel checksum is cheap
    # and catches both size and content changes.  NOTE (intended one-time
    # break, ADVICE r4): adding the data_* keys invalidates checkpoints
    # written before r4's datagen rebuild — deliberate, because every such
    # checkpoint predates the quarantine-filtered dataset and resuming one
    # against the rebuilt data would silently mix shuffle universes.  All r4
    # legs completed, so nothing in flight was lost.
    _g = data.fnet.shape[1] // 2
    _sig = np.asarray(
        data.fnet[:: max(1, len(data.fnet) // 8), _g, _g, :], np.float64)
    recipe = {"preset": preset_name, "component": component,
              "batch_size": batch_size, "lr": learning_rate, "seed": seed,
              "optimizer": preset.optimizer, "schedule": schedule,
              "clip_norm": clip_norm,
              "epochs": epochs if schedule in ("cosine", "plateau") else None,
              "data_n": int(len(x)), "data_shape": list(data.fnet.shape),
              "data_sig": float(np.abs(_sig).sum())}
    if kernel_init != "lecun_normal":
        # Key only present for non-default inits, so pre-existing default-
        # init checkpoints keep resuming (their recipes lack the key).
        recipe["kernel_init"] = kernel_init

    start_epoch = 0
    if checkpoint_path and os.path.exists(checkpoint_path):
        loaded = _load_train_checkpoint(checkpoint_path, params, opt_state,
                                        recipe)
        if loaded is not None and loaded[3] > epochs:
            loaded = None  # stored progress exceeds this run's budget
        if loaded is None:
            print(f"[{preset_name}/{component}] checkpoint at "
                  f"{checkpoint_path} is from a different recipe or budget; "
                  "starting fresh", flush=True)
        else:
            params, opt_state, history, start_epoch = loaded
            params, opt_state = put_repl(params), put_repl(opt_state)
            for _ in range(start_epoch):  # replay the shuffle trajectory
                shuffle_rng.permutation(tr_idx)
            if verbose:
                print(f"[{preset_name}/{component}] resumed at epoch "
                      f"{start_epoch}/{epochs} from {checkpoint_path}")

    for ep in range(start_epoch, epochs):
        order = shuffle_rng.permutation(tr_idx)
        losses = []
        for s in range(steps_per_epoch):
            bi = order[s * batch_size : (s + 1) * batch_size]
            bi = jnp.asarray(bi)
            auxb = None if aux is None else put_batch(aux[bi])
            params, opt_state, loss = update(
                params, opt_state, put_batch(x[bi]), auxb, put_batch(y[bi])
            )
            losses.append(loss)  # device scalar; fetched once per epoch
        ep_loss = float(jnp.mean(jnp.stack(losses)))
        vl = float(eval_loss(params, x[va], vaux, y[va]))
        history["loss"].append(ep_loss)
        history["val_loss"].append(vl)
        if verbose:
            print(f"[{preset_name}/{component}] epoch {ep + 1}/{epochs} "
                  f"loss={history['loss'][-1]:.3e} val={vl:.3e}")
        if checkpoint_path and (
            (ep + 1) % checkpoint_every == 0 or ep + 1 == epochs
        ):
            _save_train_checkpoint(
                checkpoint_path, params, opt_state, history, ep + 1, recipe)

    return TrainResult(params=jax.device_get(params), history=history,
                       preset=preset, component=component)


def _save_train_checkpoint(path, params, opt_state, history, epoch,
                           recipe) -> None:
    """Atomic (tmp + rename) mid-training snapshot: flax-msgpack for the
    (params, opt_state) pytree, JSON sidecar header for epoch/history and
    the recipe fingerprint that makes resume refuse foreign checkpoints."""
    blob = serialization.to_bytes((jax.device_get(params),
                                   jax.device_get(opt_state)))
    header = json.dumps({"epoch": epoch, "history": history,
                         "recipe": recipe}).encode()
    tmp = path + ".tmp"
    with open(tmp, "wb") as fh:
        fh.write(len(header).to_bytes(8, "little"))
        fh.write(header)
        fh.write(blob)
    os.replace(tmp, path)


def _load_train_checkpoint(path, params_template, opt_state_template,
                           recipe):
    """Returns (params, opt_state, history, epoch), or None when the
    checkpoint was written by a different recipe (or predates recipe
    fingerprints) and must not be resumed from."""
    with open(path, "rb") as fh:
        hlen = int.from_bytes(fh.read(8), "little")
        header = json.loads(fh.read(hlen))
        blob = fh.read()
    if header.get("recipe") != recipe:
        return None
    params, opt_state = serialization.from_bytes(
        (params_template, opt_state_template), blob)
    return params, opt_state, header["history"], int(header["epoch"])


def fine_tune(preset_name: str, data: PreparedData, params: dict,
              component: str = "x", epochs: int = 50,
              learning_rate: float = 1e-4, **kw) -> TrainResult:
    """Refit saved weights at a lower LR (reference: ``CNN_test.py:100-106``,
    RMSprop lr=1e-4)."""
    return train(preset_name, data, component=component, epochs=epochs,
                 learning_rate=learning_rate, init_params=params, **kw)


# ---------------------------------------------------------------------------
# Persistence (replaces Keras .h5 saves, reference: CNN_Eight.py:161)
# ---------------------------------------------------------------------------

def save_weights(result: TrainResult, out_dir: str,
                 scalers: Optional[dict] = None) -> str:
    os.makedirs(out_dir, exist_ok=True)
    stem = f"{result.preset.name}_{result.component}"
    path = os.path.join(out_dir, stem + ".msgpack")
    with open(path, "wb") as fh:
        fh.write(serialization.to_bytes(result.params))
    meta = {
        "preset": result.preset.name,
        "component": result.component,
        "history": result.history,
    }
    if scalers is not None:
        meta["scalers"] = scalers
    with open(os.path.join(out_dir, stem + ".json"), "w") as fh:
        json.dump(meta, fh)
    return path


def load_weights(preset_name: str, component: str, out_dir: str,
                 example: Tuple[np.ndarray, Optional[np.ndarray]]):
    """Load params (shape-restored against an example input)."""
    model = make_model(preset_name)
    x, aux = example
    rng = jax.random.PRNGKey(0)
    args = (jnp.asarray(x[:1]),) if aux is None else (
        jnp.asarray(x[:1]), jnp.asarray(aux[:1]))
    template = model.init(rng, *args)["params"]
    stem = f"{preset_name}_{component}"
    with open(os.path.join(out_dir, stem + ".msgpack"), "rb") as fh:
        params = serialization.from_bytes(template, fh.read())
    meta_path = os.path.join(out_dir, stem + ".json")
    meta = json.load(open(meta_path)) if os.path.exists(meta_path) else {}
    return params, meta


def plot_history(history: dict, path: str) -> str:
    """Loss-history PNG (reference: ``CNN_Eight.py:153-159``)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(7, 4.5))
    ax.semilogy(history["loss"], label="train")
    ax.semilogy(history["val_loss"], label="val")
    ax.set_xlabel("epoch")
    ax.set_ylabel("MSE")
    ax.legend()
    ax.grid(alpha=0.3)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)
    return path
