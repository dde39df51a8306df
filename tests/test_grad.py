"""Gradient validation: autodiff vs finite differences, and inverse-rendering
recovery (BASELINE.json correctness criteria)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mcpt_tpu.diff.grad import (
    SceneParams,
    extract_params,
    loss_and_grad,
    mse_loss,
    render_image,
)


def _small(scene, w=24, h=24):
    cam = dataclasses.replace(scene.camera, width=w, height=h)
    return dataclasses.replace(scene, camera=cam)


@pytest.fixture(scope="module")
def grad_scene(cornell_scene):
    return _small(cornell_scene)


def test_grad_matches_finite_difference(grad_scene):
    """Central FD vs autodiff on kd and radiance entries.

    The RNG is a pure function of (seed, pixel, bounce), so at fixed seed the
    estimator is a deterministic function of params; sampling decisions are
    detached and only flip on a measure-zero set, so small-eps FD matches.
    """
    scene = grad_scene
    key = jax.random.PRNGKey(3)
    params0 = extract_params(scene)
    target = jnp.zeros((24, 24, 3))
    spp, bounces = 2, 4

    loss, grads = loss_and_grad(params0, scene, target, key, spp, bounces)
    assert np.isfinite(float(loss))
    g_kd = np.asarray(grads.kd)
    g_rad = np.asarray(grads.radiance)
    assert np.isfinite(g_kd).all() and np.isfinite(g_rad).all()
    # white kd (mat 0) and light radiance (emissive mat) must have signal
    assert np.abs(g_kd[0]).max() > 0
    emissive = np.linalg.norm(np.asarray(params0.radiance), axis=-1) > 0.01
    m_l = int(np.nonzero(emissive)[0][0])
    assert np.abs(g_rad[m_l]).max() > 0

    def fd(param_name, m, c, eps):
        def perturb(delta):
            arr = getattr(params0, param_name)
            arr = arr.at[m, c].add(delta)
            p = dataclasses.replace(params0, **{param_name: arr})
            return float(mse_loss(p, scene, target, key, spp, bounces))

        return (perturb(eps) - perturb(-eps)) / (2 * eps)

    # kd of the white material, green channel
    ad = float(grads.kd[0, 1])
    num = fd("kd", 0, 1, 2e-3)
    assert abs(ad - num) <= 0.05 * max(abs(ad), abs(num), 1e-6), (ad, num)

    # light radiance, red channel (large value -> larger eps)
    ad = float(grads.radiance[m_l, 0])
    num = fd("radiance", m_l, 0, 0.05)
    assert abs(ad - num) <= 0.05 * max(abs(ad), abs(num), 1e-9), (ad, num)


def test_render_image_is_deterministic_fn_of_params(grad_scene):
    key = jax.random.PRNGKey(0)
    p = extract_params(grad_scene)
    a = np.asarray(render_image(p, grad_scene, key, 1, 3))
    b = np.asarray(render_image(p, grad_scene, key, 1, 3))
    np.testing.assert_array_equal(a, b)


def test_inverse_recovers_albedo(grad_scene):
    """Perturb the red wall's albedo; Adam on pixel MSE must recover it."""
    from mcpt_tpu.diff.inverse import run_inverse

    scene = grad_scene
    true_params = extract_params(scene)
    key = jax.random.PRNGKey(11)
    target = render_image(true_params, scene, key, 8, 5)

    kd0 = np.asarray(true_params.kd).copy()
    red_idx = 2  # material order: white, green, red, light
    start = kd0.copy()
    start[red_idx] = [0.3, 0.3, 0.3]  # wrong albedo
    init = dataclasses.replace(true_params, kd=jnp.asarray(start))
    mask = SceneParams(
        kd=jnp.zeros_like(true_params.kd).at[red_idx].set(1.0),
        ks=jnp.zeros_like(true_params.ks),
        radiance=jnp.zeros_like(true_params.radiance),
    )
    final, losses = run_inverse(
        scene, target, init, steps=200, spp=2, max_bounces=5,
        learning_rate=5e-2, param_mask=mask, seed=4,
    )
    got = np.asarray(final.kd[red_idx])
    true = kd0[red_idx]
    # dual-buffer loss is near its floor from step 0 (target noise), so
    # convergence is judged on the parameter itself
    assert np.abs(got - true).max() < 0.08, (got, true)


def test_inverse_recovers_emission(grad_scene):
    from mcpt_tpu.diff.inverse import run_inverse

    scene = grad_scene
    true_params = extract_params(scene)
    key = jax.random.PRNGKey(12)
    target = render_image(true_params, scene, key, 8, 5)

    emissive = np.linalg.norm(np.asarray(true_params.radiance), axis=-1) > 0.01
    m_l = int(np.nonzero(emissive)[0][0])
    rad0 = np.asarray(true_params.radiance).copy()
    start = rad0.copy()
    start[m_l] = rad0[m_l] * 0.4  # dimmed light
    init = dataclasses.replace(true_params, radiance=jnp.asarray(start))
    mask = SceneParams(
        kd=jnp.zeros_like(true_params.kd),
        ks=jnp.zeros_like(true_params.ks),
        radiance=jnp.zeros_like(true_params.radiance).at[m_l].set(1.0),
    )
    final, losses = run_inverse(
        scene, target, init, steps=80, spp=2, max_bounces=5,
        learning_rate=1.0, param_mask=mask, seed=5,
    )
    got = np.asarray(final.radiance[m_l])
    rel = np.abs(got - rad0[m_l]) / rad0[m_l]
    assert rel.max() < 0.15, (got, rad0[m_l])


def test_vertex_grad_matches_finite_difference(grad_scene):
    """d(loss)/d(vertex): autodiff vs central FD along a light translation.

    Moves the cornell light's 6 shared vertices down in y (direction -> all
    NEE d^2/cos/area factors and look-ahead emission geometry change
    smoothly). eps must be small enough that no sampled ray's discrete
    decision (hit id, visibility) flips inside [-eps, +eps] — at eps 0.25
    flips corrupt FD by ~30%; below 0.05 FD plateaus. A ~5% pathwise gap
    remains BY DESIGN: the detached-random estimator (diff/grad.py)
    detaches the sampled-direction pdf and RR 1/q factors together with the
    draws they belong to (unbiased in expectation, lower variance), while a
    fixed-seed FD differentiates those factors pathwise. Tolerance 15%
    covers the design gap + FD noise with margin.
    """
    scene = grad_scene
    params0 = extract_params(scene)
    assert params0.dverts is not None, "cornell scene must carry vert_idx"
    key = jax.random.PRNGKey(9)
    target = jnp.zeros((24, 24, 3))
    spp, bounces = 2, 3

    lv = np.unique(
        np.asarray(scene.geom.vert_idx)[np.asarray(scene.light_tris)]
    )
    direction = np.zeros_like(np.asarray(params0.dverts))
    direction[lv, 1] = -1.0  # light moves down toward the scene
    direction = jnp.asarray(direction)

    _, grads = jax.value_and_grad(mse_loss)(
        params0, scene, target, key, spp, bounces
    )
    g = np.asarray(grads.dverts)
    assert np.isfinite(g).all()
    assert np.abs(g[lv]).max() > 0, "no vertex gradient signal on the light"
    ad = float(jnp.sum(grads.dverts * direction))

    def at(eps):
        p = dataclasses.replace(params0, dverts=params0.dverts + eps * direction)
        return float(mse_loss(p, scene, target, key, spp, bounces))

    eps = 0.02  # scene units (cornell box spans ~550); no decision flips
    num = (at(eps) - at(-eps)) / (2 * eps)
    assert abs(ad - num) <= 0.15 * max(abs(ad), abs(num), 1e-9), (ad, num)


def _write_grid_scene(dirp, n=48):
    """A >4096-triangle scene with shared vertices: an n x n floor grid lit
    by an overhead quad. Exercises the treelet dispatch path for gradients
    (anything past ops/intersect.TREELET_MIN_TRIS builds treelets)."""
    import os

    obj = ["mtllib grid.mtl"]
    for j in range(n + 1):
        for i in range(n + 1):
            obj.append(f"v {i / n:.6f} 0.0 {j / n:.6f}")
    # light quad, y = 0.8, facing down
    for x, z in ((0.3, 0.3), (0.7, 0.3), (0.7, 0.7), (0.3, 0.7)):
        obj.append(f"v {x} 0.8 {z}")
    obj.append("vn 0.0 1.0 0.0")
    obj.append("vn 0.0 -1.0 0.0")
    obj.append("usemtl white")
    for j in range(n):
        for i in range(n):
            a = j * (n + 1) + i + 1
            b, c, d = a + 1, a + n + 2, a + n + 1
            obj.append(f"f {a}//1 {c}//1 {b}//1")
            obj.append(f"f {a}//1 {d}//1 {c}//1")
    L = (n + 1) * (n + 1) + 1
    obj.append("usemtl light")
    obj.append(f"f {L}//2 {L + 1}//2 {L + 2}//2")
    obj.append(f"f {L}//2 {L + 2}//2 {L + 3}//2")
    with open(os.path.join(dirp, "grid.obj"), "w") as f:
        f.write("\n".join(obj) + "\n")
    with open(os.path.join(dirp, "grid.mtl"), "w") as f:
        f.write("newmtl white\nKd 0.75 0.75 0.75\n\n"
                "newmtl light\nKd 0.65 0.65 0.65\n")
    with open(os.path.join(dirp, "grid.xml"), "w") as f:
        f.write(
            '<camera type="perspective" width="64" height="64" fovy="45">\n'
            '  <eye x="0.5" y="0.55" z="-0.9"/>\n'
            '  <lookat x="0.5" y="0.25" z="0.3"/>\n'
            '  <up x="0.0" y="1.0" z="0.0"/>\n'
            "</camera>\n"
            '<light mtlname="light" radiance="30,30,30"/>\n'
        )
    return os.path.join(dirp, "grid.obj")


@pytest.mark.slow
def test_vertex_grad_on_treelet_scene(tmp_path, monkeypatch):
    """VERDICT r3 #6: d(pixel)/d(vertex) on a scene past the treelet
    threshold. The kernel's hit selection is frozen (stop_gradient at the
    dispatch site); expand_hit re-derives hit geometry attached, so dverts
    gradients flow — validated against central finite differences."""
    from mcpt_tpu.io.obj import load_scene
    from mcpt_tpu.ops import intersect

    scene = load_scene(_write_grid_scene(str(tmp_path)), with_bvh=True)
    assert scene.num_tris > 4096, scene.num_tris
    assert scene.treelets is not None
    # force treelet dispatch on the CPU test backend (kernel -> interpret)
    monkeypatch.setattr(intersect, "TRAVERSAL", "treelets")
    assert intersect.uses_treelets(scene)

    scene = _small(scene, 12, 12)
    params0 = extract_params(scene)
    assert params0.dverts is not None
    key = jax.random.PRNGKey(5)
    target = jnp.zeros((12, 12, 3))
    spp, bounces = 1, 2

    lv = np.unique(
        np.asarray(scene.geom.vert_idx)[np.asarray(scene.light_tris)]
    )
    # TANGENTIAL light motion (+x, in the emitter's plane): the treelet
    # arrays hold BASE geometry (re-baked between inverse steps, diff/grad
    # contract), so moving an emitter along its own normal makes the STALE
    # copy occlude the displaced light sample — a step discontinuity FD
    # sees but the frozen-selection estimator correctly doesn't model.
    # In-plane motion cannot flip that visibility, while the NEE geometry
    # (d^2, cos_l, sample position) still changes smoothly.
    direction = np.zeros_like(np.asarray(params0.dverts))
    direction[lv, 0] = 1.0
    direction = jnp.asarray(direction)

    _, grads = jax.value_and_grad(mse_loss)(
        params0, scene, target, key, spp, bounces
    )
    g = np.asarray(grads.dverts)
    assert np.isfinite(g).all()
    assert np.abs(g[lv]).max() > 0, "no vertex gradient through the treelet path"
    ad = float(jnp.sum(grads.dverts * direction))

    def at(eps):
        p = dataclasses.replace(params0, dverts=params0.dverts + eps * direction)
        return float(mse_loss(p, scene, target, key, spp, bounces))

    eps = 2e-3  # scene spans ~1.3 units
    num = (at(eps) - at(-eps)) / (2 * eps)
    assert abs(ad - num) <= 0.15 * max(abs(ad), abs(num), 1e-9), (ad, num)


@pytest.mark.slow
def test_inverse_recovers_light_height(grad_scene):
    """VERTEX inverse rendering: recover the cornell light's HEIGHT by
    gradient descent through the vertex-displacement field. The light
    starts 30 units too low; the loss is differentiated w.r.t. one rigid
    scalar (height h, dverts = h * e_y on the light's shared vertices) —
    the well-posed rigid mode. (Optimizing all 6 vertex coordinates
    independently is ill-posed at this sample count: per-coordinate Adam
    tilts the quad into spurious partial matches — measured mean stall at
    -14 with per-vertex spread [-36, -4]. Rigid/low-dimensional
    parameterizations are the standard remedy.) Dense-path dispatch keeps
    hit selection consistent with the displaced geometry at every
    evaluation. The reference has no analog — this is the BASELINE north
    star's vertex-gradient stage."""
    import optax

    from mcpt_tpu.diff.grad import mse_loss_dual

    scene = grad_scene
    true_params = extract_params(scene)
    assert true_params.dverts is not None
    key = jax.random.PRNGKey(21)
    target = render_image(true_params, scene, key, 8, 4)

    lv = np.unique(
        np.asarray(scene.geom.vert_idx)[np.asarray(scene.light_tris)]
    )
    mode = np.zeros_like(np.asarray(true_params.dverts))
    mode[lv, 1] = 1.0  # rigid vertical translation of the light quad
    mode = jnp.asarray(mode)

    def loss_h(h, k):
        p = dataclasses.replace(true_params, dverts=h * mode)
        return mse_loss_dual(p, scene, target, k, 2, 4)

    OFFSET = 30.0
    STEPS = 200
    h = jnp.asarray(-OFFSET)
    # cosine-decayed rate: far from the optimum the gradient is strong
    # (SNR >> 1) and big steps close the 30-unit gap; near it the
    # gradient shrinks ~14x while per-step estimator noise is constant,
    # so the rate must shrink for Adam to settle instead of random-walk
    opt = optax.adam(optax.cosine_decay_schedule(1.0, STEPS, 0.02))
    opt_state = opt.init(h)

    @jax.jit
    def step(h, opt_state, k):
        loss, g = jax.value_and_grad(loss_h)(h, k)
        g = jnp.where(jnp.isfinite(g), g, 0.0)
        up, opt_state = opt.update(g, opt_state, h)
        return optax.apply_updates(h, up), opt_state, loss

    key2 = jax.random.PRNGKey(6)
    for i in range(STEPS):
        h, opt_state, loss = step(h, opt_state, jax.random.fold_in(key2, i))
    got = float(h)
    # recovered the height within a few units of true (0 displacement)
    assert abs(got) < 0.2 * OFFSET, got
