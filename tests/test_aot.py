"""AOT model archives (jax.export) — the analogue of the reference's
juliac AOT-compiled apps (/root/reference/test/JuliaCTest/JuliaCTest.jl):
save a frozen model's oracle programs, reload without the builder, and check
every oracle agrees bit-for-bit; then solve the loaded model."""

import numpy as np
import pytest

from examodels_tpu import madipm
from examodels_tpu.models import luksan_vlcek_model
from examodels_tpu.utils.aot import load_model, save_model


@pytest.fixture(scope="module")
def archive(tmp_path_factory):
    model = luksan_vlcek_model(16)
    path = tmp_path_factory.mktemp("aot") / "lv16.exa"
    save_model(model, str(path))
    return model, str(path)


def test_aot_roundtrip_oracles(archive):
    model, path = archive
    loaded = load_model(path)

    assert loaded.nvar == model.nvar
    assert loaded.ncon == model.ncon
    assert loaded.nnzj == model.nnzj
    assert loaded.nnzh == model.nnzh

    rng = np.random.default_rng(3)
    x = np.asarray(model.x0) + 0.1 * rng.standard_normal(model.nvar)
    y = rng.standard_normal(model.ncon)
    v = rng.standard_normal(model.nvar)

    np.testing.assert_array_equal(
        np.asarray(loaded.obj(x)), np.asarray(model.obj(x))
    )
    np.testing.assert_array_equal(
        np.asarray(loaded.cons(x)), np.asarray(model.cons(x))
    )
    np.testing.assert_array_equal(
        np.asarray(loaded.grad(x)), np.asarray(model.grad(x))
    )
    np.testing.assert_array_equal(
        np.asarray(loaded.jac_coord(x)), np.asarray(model.jac_coord(x))
    )
    np.testing.assert_array_equal(
        np.asarray(loaded.hess_coord(x, y)), np.asarray(model.hess_coord(x, y))
    )
    hj_l = loaded.hess_jac_coord(x, y)
    hj_m = model.hess_jac_coord(x, y)
    np.testing.assert_array_equal(np.asarray(hj_l[0]), np.asarray(hj_m[0]))
    np.testing.assert_array_equal(np.asarray(hj_l[1]), np.asarray(hj_m[1]))
    np.testing.assert_array_equal(
        np.asarray(loaded.jprod(x, v)), np.asarray(model.jprod(x, v))
    )
    np.testing.assert_array_equal(
        np.asarray(loaded.jtprod(x, y)), np.asarray(model.jtprod(x, y))
    )
    np.testing.assert_array_equal(
        np.asarray(loaded.hprod(x, y, v)), np.asarray(model.hprod(x, y, v))
    )

    for (a, b) in zip(loaded.jac_structure(), model.jac_structure()):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for (a, b) in zip(loaded.hess_structure(), model.hess_structure()):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_aot_model_solves(archive):
    model, path = archive
    loaded = load_model(path)
    r_loaded = madipm(loaded, tol=1e-8)
    r_direct = madipm(model, tol=1e-8)
    assert r_loaded.success
    np.testing.assert_allclose(
        np.asarray(r_loaded.x), np.asarray(r_direct.x), atol=1e-8
    )
    np.testing.assert_allclose(
        r_loaded.objective, r_direct.objective, rtol=1e-10
    )
