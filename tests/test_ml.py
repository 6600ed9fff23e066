"""ML surrogate pipeline: datagen schema + convergence, model forward shapes,
train/fine-tune/save/load round-trip, predict + comparison evaluation."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from latticeboltzmannsimulations_tpu.config import SimConfig
from latticeboltzmannsimulations_tpu.ml import (
    PRESETS,
    generate_dataset,
    load_dataset,
    make_model,
    save_dataset,
)
from latticeboltzmannsimulations_tpu.ml import predict as ml_predict
from latticeboltzmannsimulations_tpu.ml import train as ml_train
from latticeboltzmannsimulations_tpu.ml.scaling import MaxScaler, MinMaxScaler


def _datagen_cfg(n=48):
    return SimConfig(
        nx=n, ny=n, reynolds=100.0, collision="srt",
        max_steps=400, report_interval=100,
        convergence_tol=1e-5, convergence_hits=2, precision="float32",
    )


@pytest.fixture(scope="module")
def small_dataset():
    cfg = _datagen_cfg()
    ds = generate_dataset(cfg, re_values=np.array([100.0, 150.0, 200.0, 250.0]),
                          batch_size=4)
    return cfg, ds


def test_datagen_schema_and_roundtrip(small_dataset, tmp_path_factory):
    cfg, ds = small_dataset
    n = 4
    assert ds.re_range.shape == (n,)
    assert ds.feq_initial.shape == (9, cfg.nx, cfg.ny)
    assert ds.f_final.shape == (n, 9, cfg.nx, cfg.ny)
    assert ds.u_final.shape == (n, 2, cfg.nx, cfg.ny)
    assert np.all(np.isfinite(ds.f_final))
    # same four-file layout as the reference (MRT_GPU_datagen.py:899-902)
    d = str(tmp_path_factory.mktemp("ds"))
    save_dataset(ds, d)
    assert sorted(os.listdir(d)) == [
        "Re_range.npy", "f_final.npy", "feq_initial.npy", "u_final.npy"
    ]
    ds2 = load_dataset(d)
    np.testing.assert_array_equal(ds2.u_final, ds.u_final)


def test_datagen_physics_monotonic(small_dataset):
    """Higher Re -> slower decay of the lid jet into the cavity: the
    mid-column Ux minimum should differ across Re (fields not identical)."""
    _, ds = small_dataset
    mins = [u[0].min() for u in ds.u_final]
    assert len(set(np.round(mins, 6))) == len(mins)


def test_scalers_roundtrip():
    a = np.linspace(-3, 7, 50).reshape(5, 10)
    mm = MinMaxScaler((0.2, 0.7))
    out = mm.fit_transform(a)
    assert out.min() == pytest.approx(0.2) and out.max() == pytest.approx(0.7)
    np.testing.assert_allclose(mm.inverse_transform(out), a, atol=1e-12)
    mm2 = MinMaxScaler.from_dict(mm.to_dict())
    np.testing.assert_allclose(mm2.transform(a), out)

    mx = MaxScaler()
    np.testing.assert_allclose(mx.inverse_transform(mx.fit_transform(a)), a)


@pytest.mark.parametrize("preset_name", ["cnn_one", "cnn_eight", "cnn_nine", "cnn_ten"])
def test_model_forward_shapes(preset_name):
    import jax

    preset = PRESETS[preset_name]
    model = make_model(preset_name)
    # smallest grid compatible with the preset's stride pyramid
    res = 48 if preset.resolution == 192 else 192
    x = jnp.zeros((1, res, res, 10))
    aux = (jnp.zeros((1, res, res, 2))
           if (preset.aux_bc_at_input or preset.aux_bc_at_head) else None)
    args = (x,) if aux is None else (x, aux)
    params = model.init(jax.random.PRNGKey(0), *args)["params"]
    out = model.apply({"params": params}, *args)
    assert out.shape == (1, res, res, 1)


def test_train_finetune_save_load_predict(small_dataset, tmp_path):
    cfg, ds = small_dataset
    preset_name = "cnn_one"
    data = ml_train.prepare_inputs(ds, PRESETS[preset_name], u_lid=cfg.u_lid)
    assert data.fnet.shape == (4, cfg.nx, cfg.ny, 10)

    res = ml_train.train(preset_name, data, component="x", epochs=3,
                         batch_size=2)
    assert len(res.history["loss"]) == 3
    assert np.isfinite(res.history["loss"]).all()

    # fine-tune continues from the weights without blowing up
    ft = ml_train.fine_tune(preset_name, data, res.params, component="x",
                            epochs=2, batch_size=2)
    assert np.isfinite(ft.history["loss"]).all()

    # save / load round-trip
    out = str(tmp_path)
    ml_train.save_weights(res, out, scalers=data.scalers)
    params, meta = ml_train.load_weights(
        preset_name, "x", out, (data.fnet, data.aux))
    assert meta["preset"] == preset_name

    png = ml_train.plot_history(res.history, os.path.join(out, "h.png"))
    assert os.path.getsize(png) > 1000

    # predict both components (reuse x-params for y: shape path only)
    fnet, aux = ml_predict.build_input(
        preset_name, 120.0, ds.feq_initial, data.scalers, u_lid=cfg.u_lid)
    u = ml_predict.predict_velocity(preset_name, params, params, fnet, aux,
                                    data.scalers)
    assert u.shape == (2, cfg.nx, cfg.ny) and np.all(np.isfinite(u))

    # evaluation figure vs a quick LBM run
    u_lbm = ml_predict.lbm_reference(cfg)
    metrics = ml_predict.comparison_figure(
        cfg, u_lbm, u, os.path.join(out, "cmp.png"))
    assert os.path.exists(metrics["figure"])
    assert "cnn_vs_lbm_l2" in metrics


@pytest.mark.parametrize("schedule",
                         ["cosine", "plateau", "inverse", "inverse:0.04"])
def test_train_lr_schedules(small_dataset, schedule):
    cfg, ds = small_dataset
    data = ml_train.prepare_inputs(ds, PRESETS["cnn_one"], u_lid=cfg.u_lid)
    res = ml_train.train("cnn_one", data, component="x", epochs=3,
                         batch_size=2, schedule=schedule)
    assert np.isfinite(res.history["loss"]).all()


def test_train_clip_norm(small_dataset):
    cfg, ds = small_dataset
    data = ml_train.prepare_inputs(ds, PRESETS["cnn_one"], u_lid=cfg.u_lid)
    res = ml_train.train("cnn_one", data, component="x", epochs=3,
                         batch_size=2, clip_norm=1.0)
    assert np.isfinite(res.history["loss"]).all()


def test_train_rejects_unknown_schedule(small_dataset):
    cfg, ds = small_dataset
    data = ml_train.prepare_inputs(ds, PRESETS["cnn_one"], u_lid=cfg.u_lid)
    with pytest.raises(ValueError, match="schedule"):
        ml_train.train("cnn_one", data, component="x", epochs=1,
                       batch_size=2, schedule="warmup")


def test_check_grid_constraint():
    from latticeboltzmannsimulations_tpu.ml.models import (
        PRESETS, check_grid, stride_product,
    )

    assert stride_product(PRESETS["cnn_one"]) == 48
    assert stride_product(PRESETS["cnn_eight"]) == 192
    check_grid(PRESETS["cnn_eight"], 384, 384)
    check_grid(PRESETS["cnn_eight"], 192, 192)
    with pytest.raises(ValueError):
        check_grid(PRESETS["cnn_eight"], 128, 128)


def test_datagen_on_batch_receives_convergence_flags():
    """on_batch(res, f, u, steps, converged, failed) — the incremental-
    persistence contract datagen_full/datagen_topup rely on (chunks record
    per-cavity convergence so capped batches can be resumed)."""
    cfg = _datagen_cfg(32)
    calls = []
    generate_dataset(
        cfg, re_values=np.array([100.0, 150.0, 200.0]), batch_size=2,
        on_batch=lambda res, f, u, steps, converged, failed: calls.append(
            (res.copy(), f.shape, steps, np.asarray(converged).copy(),
             np.asarray(failed).copy())),
    )
    assert [len(c[0]) for c in calls] == [2, 1]
    for res, fshape, steps, converged, failed in calls:
        assert fshape == (len(res), 9, cfg.nx, cfg.ny)
        assert converged.shape == (len(res),)
        assert converged.dtype == np.bool_
        assert not failed.any()
        assert 0 < steps <= cfg.max_steps


def test_datagen_quarantines_diverging_cavity():
    """A diverging Re in a batch must not kill the sweep: it is marked
    failed with zeroed fields and the rest of the batch completes
    (the reference's per-run loop simply moved past a blown-up Re,
    MRT_GPU_datagen.py:55-69)."""
    cfg = _datagen_cfg(32)
    # A negative Reynolds number gives tau < 0.5 (omega > 2): guaranteed
    # blow-up within a few steps, in-batch with two stable runs.
    ds = generate_dataset(
        cfg, re_values=np.array([100.0, -50.0, 200.0]), batch_size=3,
    )
    assert ds.failed is not None
    assert ds.failed.tolist() == [False, True, False]
    assert np.all(ds.f_final[1] == 0.0) and np.all(ds.u_final[1] == 0.0)
    for i in (0, 2):
        assert np.all(np.isfinite(ds.f_final[i]))
        assert np.abs(ds.u_final[i]).max() > 0.0


def test_failed_mask_persists_and_filters(small_dataset, tmp_path):
    """Quarantined cavities round-trip through the 4-file layout via
    failed.npy and can never reach training: prepare_inputs drops them
    (ADVICE r3: zero-filled slots used to flow silently into the dataset)."""
    from latticeboltzmannsimulations_tpu.ml.datagen import (
        DatasetArrays, drop_failed,
    )

    cfg, ds = small_dataset
    failed = np.array([False, True, False, False])
    bad = DatasetArrays(re_range=ds.re_range, feq_initial=ds.feq_initial,
                        f_final=ds.f_final.copy(), u_final=ds.u_final.copy(),
                        failed=failed)
    bad.f_final[1] = 0.0
    bad.u_final[1] = 0.0
    d = str(tmp_path)
    save_dataset(bad, d)
    assert os.path.exists(os.path.join(d, "failed.npy"))
    ds2 = load_dataset(d)
    np.testing.assert_array_equal(ds2.failed, failed)

    kept = drop_failed(ds2)
    assert kept.failed is None
    assert len(kept.re_range) == 3
    assert 150.0 not in kept.re_range  # the quarantined Re is gone
    # prepare_inputs applies the filter implicitly.
    data = ml_train.prepare_inputs(ds2, PRESETS["cnn_one"], u_lid=cfg.u_lid)
    assert data.fnet.shape[0] == 3
    # and a clean dataset (no failed.npy) is untouched
    save_dataset(ds, d)
    assert not np.any(ml_train.prepare_inputs(
        load_dataset(d), PRESETS["cnn_one"], u_lid=cfg.u_lid
    ).fnet.shape[0] != 4)


def test_train_data_parallel_matches_single_device(small_dataset):
    """train(mesh=...) — data-parallel over the mesh's first axis with
    replicated params (SURVEY §2.7 scale axis) — reproduces the
    single-device run up to float reduction order, on the identical
    minibatch schedule."""
    import jax
    from jax.sharding import Mesh

    cfg, ds = small_dataset
    data = ml_train.prepare_inputs(ds, PRESETS["cnn_one"], u_lid=cfg.u_lid)
    kw = dict(component="x", epochs=3, batch_size=3, learning_rate=1e-3,
              optimizer="adam")
    single = ml_train.train("cnn_one", data, **kw)
    mesh = Mesh(np.asarray(jax.devices()[:3]), ("batch",))
    dp = ml_train.train("cnn_one", data, mesh=mesh, **kw)

    assert dp.history["loss"] == pytest.approx(single.history["loss"],
                                               rel=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(single.params),
                    jax.tree_util.tree_leaves(dp.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-6)

    with pytest.raises(ValueError, match="divide"):
        ml_train.train("cnn_one", data, mesh=mesh, component="x",
                       epochs=1, batch_size=4)


def test_dp_update_compiles_gradient_allreduce():
    """The data-parallel step is genuinely partitioned: with a
    batch-sharded minibatch and replicated params, the compiled update
    must contain a cross-device gradient all-reduce (not a silent
    all-gather-and-replicate)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec

    from latticeboltzmannsimulations_tpu.ml.models import make_model

    mesh = Mesh(np.asarray(jax.devices()[:4]), ("batch",))
    model = make_model("cnn_one")
    xb = jnp.zeros((4, 48, 48, 10), jnp.float32)
    yb = jnp.zeros((4, 48, 48, 1), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), xb[:1])["params"]
    sb = NamedSharding(mesh, PartitionSpec("batch"))
    sr = NamedSharding(mesh, PartitionSpec())
    params = jax.device_put(params, sr)
    xb, yb = jax.device_put(xb, sb), jax.device_put(yb, sb)

    def loss(p, xb, yb):
        return jnp.mean((model.apply({"params": p}, xb) - yb) ** 2)

    txt = jax.jit(jax.grad(loss)).lower(params, xb, yb).compile().as_text()
    assert "all-reduce" in txt


def test_datagen_mesh_matches_single_device(small_dataset):
    """generate_dataset(mesh=...): the sweep sharded over devices is the
    same sweep — each cavity's trajectory is computed by exactly one
    device with identical arithmetic, so the arrays match bitwise."""
    import jax
    from jax.sharding import Mesh

    cfg, ds = small_dataset  # the unsharded reference sweep (batch_size=4)
    mesh = Mesh(np.asarray(jax.devices()[:4]), ("batch",))
    ds_dp = generate_dataset(
        cfg, re_values=np.array([100.0, 150.0, 200.0, 250.0]),
        batch_size=4, mesh=mesh)
    np.testing.assert_array_equal(ds_dp.f_final, ds.f_final)
    np.testing.assert_array_equal(ds_dp.u_final, ds.u_final)


def test_failed_mask_survives_split_and_downsample(small_dataset):
    """The quarantine mask must ride through the training scripts' held-out
    split and 384→192 downsample (code-review r4: split_dataset used to
    rebuild DatasetArrays without it, silently defeating drop_failed), and
    a quarantined Re must never become a held-out evaluation 'truth'."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))), "scripts"))
    from train_full import downsample, split_dataset

    from latticeboltzmannsimulations_tpu.ml.datagen import DatasetArrays

    cfg, ds = small_dataset
    held_out = [float(ds.re_range[2])]
    failed = np.array([False, True, True, False])  # one train, one held-out
    bad = DatasetArrays(re_range=ds.re_range, feq_initial=ds.feq_initial,
                        f_final=ds.f_final.copy(), u_final=ds.u_final.copy(),
                        failed=failed)
    bad.f_final[1] = bad.u_final[1] = 0.0
    bad.f_final[2] = bad.u_final[2] = 0.0

    train_ds, held = split_dataset(bad, held_out)
    assert train_ds.failed is not None
    np.testing.assert_array_equal(train_ds.failed, [False, True, False])
    # the failed held-out Re must not be evaluated against its zero field
    assert set(held) == set()
    # and prepare_inputs drops the failed training slot post-split
    data = ml_train.prepare_inputs(train_ds, PRESETS["cnn_one"],
                                   u_lid=cfg.u_lid)
    assert data.fnet.shape[0] == 2

    small = downsample(train_ds)
    np.testing.assert_array_equal(small.failed, train_ds.failed)


def test_train_checkpoint_refuses_foreign_recipe(small_dataset, tmp_path):
    """A completed run's final checkpoint must not be resumed by a later
    train() with a different recipe/budget at the same path (code-review
    r4: start_epoch >= epochs used to skip the loop and return the old
    params labeled as the new recipe's)."""
    cfg, ds = small_dataset
    data = ml_train.prepare_inputs(ds, PRESETS["cnn_one"], u_lid=cfg.u_lid)
    ckpt = str(tmp_path / "leg.ckpt")
    kw = dict(component="x", batch_size=2, checkpoint_path=ckpt,
              checkpoint_every=1)

    ml_train.train("cnn_one", data, epochs=4, optimizer="rmsprop",
                   learning_rate=1e-3, **kw)  # completes; final ckpt epoch=4
    fresh = ml_train.train("cnn_one", data, epochs=2, optimizer="adam",
                           learning_rate=1e-4, **kw)
    # the foreign checkpoint was ignored: two adam epochs actually ran
    assert len(fresh.history["loss"]) == 2


def test_train_checkpoint_resume_matches_uninterrupted(small_dataset, tmp_path):
    """A training leg killed mid-run and restarted from its checkpoint
    reproduces the uninterrupted run exactly (params + history), including
    the shuffle trajectory and the lr-schedule step count."""
    import jax

    cfg, ds = small_dataset
    data = ml_train.prepare_inputs(ds, PRESETS["cnn_one"], u_lid=cfg.u_lid)
    kw = dict(component="x", batch_size=2, optimizer="rmsprop",
              schedule="inverse", learning_rate=1e-3)

    full = ml_train.train("cnn_one", data, epochs=6, **kw)

    ckpt = str(tmp_path / "leg.ckpt")
    ml_train.train("cnn_one", data, epochs=3, checkpoint_path=ckpt,
                   checkpoint_every=1, **kw)  # "killed" after 3 epochs
    resumed = ml_train.train("cnn_one", data, epochs=6, checkpoint_path=ckpt,
                             checkpoint_every=1, **kw)

    assert resumed.history["loss"] == pytest.approx(full.history["loss"])
    flat_f = jax.tree_util.tree_leaves(full.params)
    flat_r = jax.tree_util.tree_leaves(resumed.params)
    for a, b in zip(flat_f, flat_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-8)
