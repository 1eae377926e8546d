"""Device-resident optimizer loop (optimizer="device-lbfgs").

Chunks of optax-L-BFGS iterations run inside ONE jitted program per
chunk; the host syncs once per chunk and replays the per-iteration
protocol (result updates, callbacks, convergence checks).  On the TPU
platform this amortizes the ~27-31 ms per-call host↔device latency that
otherwise caps GRAPE iteration rate."""

import numpy as np

from grape_tpu import Trajectory, hamiltonian, optimize
from grape_tpu.functionals import J_T_sm
from grape_tpu.shapes import flattop

sz = np.array([[1, 0], [0, -1]], dtype=complex)
sx = np.array([[0, 1], [1, 0]], dtype=complex)


def _tls(n_points=201):
    def eps(t):
        return 0.2 * float(flattop(t, T=5, t_rise=0.3, func="blackman"))

    H = hamiltonian(-0.5 * sz, (sx, eps))
    tlist = np.linspace(0, 5, n_points)
    return [Trajectory([1, 0], H, target_state=[0, 1])], tlist


def test_device_loop_converges_and_reports_iterations():
    trajs, tlist = _tls()
    trace = []

    def cb(wrk, iteration):
        trace.append((iteration, float(wrk.result.J_T)))

    res = optimize(
        trajs, tlist, J_T=J_T_sm, iter_stop=20,
        optimizer="device-lbfgs", device_loop_iters=5,
        callback=cb, print_iters=False, rethrow_exceptions=True,
    )
    assert res.J_T < 1e-3
    # per-iteration protocol: callback fired for every iteration 0..iter
    assert [it for it, _ in trace] == list(range(res.iter + 1))
    # fg counters account the per-iteration evaluations
    assert res.fg_calls >= res.iter


def test_device_loop_chunking_invariance():
    """Chunking must not change the math: chunk_iters=1 (one host sync
    per iteration) and chunk_iters=4 produce the identical J_T trace and
    identical optimized controls."""
    trajs, tlist = _tls(101)
    kwargs = dict(
        J_T=J_T_sm, iter_stop=8, print_iters=False,
        rethrow_exceptions=True, optimizer="device-lbfgs",
    )
    tr_1, tr_4 = [], []
    res_1 = optimize(
        trajs, tlist, device_loop_iters=1,
        callback=lambda w, i: tr_1.append(float(w.result.J_T)),
        **kwargs,
    )
    res_4 = optimize(
        trajs, tlist, device_loop_iters=4,
        callback=lambda w, i: tr_4.append(float(w.result.J_T)),
        **kwargs,
    )
    assert len(tr_4) == len(tr_1) == 9
    np.testing.assert_allclose(tr_4, tr_1, rtol=1e-9, atol=1e-12)
    for c_4, c_1 in zip(res_4.optimized_controls, res_1.optimized_controls):
        np.testing.assert_allclose(c_4, c_1, atol=1e-9)
    # and the trajectory is the healthy L-BFGS one: strict decrease to
    # deep convergence (the reference's TLS anchor reaches <1e-3 in 5)
    assert tr_4[5] < 1e-3


def test_device_loop_convergence_check_discards_surplus():
    """Convergence inside a chunk: the result stops AT the convergence
    iteration; surplus device iterations are discarded."""
    trajs, tlist = _tls()
    res = optimize(
        trajs, tlist, J_T=J_T_sm, iter_stop=50,
        optimizer="device-lbfgs", device_loop_iters=7,
        check_convergence=lambda r: (
            "J_T < 10⁻³" if r.J_T < 1e-3 else ""
        ),
        print_iters=False, rethrow_exceptions=True,
    )
    assert res.converged
    assert res.message == "J_T < 10⁻³"
    assert res.J_T < 1e-3
    # the reported pulse belongs to the convergence iterate
    from grape_tpu.controls import discretize_on_midpoints
    from grape_tpu.fg import build_fg, compile_problem

    cp = compile_problem(trajs, tlist, J_T=J_T_sm)
    x = np.concatenate([
        discretize_on_midpoints(c, tlist) for c in res.optimized_controls
    ])
    J_check, _, _ = build_fg(cp)(x)
    np.testing.assert_allclose(float(J_check), res.J_T, atol=1e-9)


def test_device_loop_native_linesearch_efficiency():
    """The native traced L-BFGS + Moré-Thuente line search (the default
    device-loop optimizer since round 4) matches the host
    reverse-communication backend's fg-per-iteration economy — the optax
    zoom default spent ~2.1 extra probes/iteration, which made the
    device loop lose its own benchmark (BENCH.md round 3).  Anchor: the
    host L-BFGS-B runs the same problem at ~1.6 fg/iter."""
    from grape_tpu.testing import cnot_problem

    p = cnot_problem()
    res = optimize(
        p.trajectories, p.tlist, iter_stop=25,
        optimizer="device-lbfgs", device_loop_iters=5,
        print_iters=False, rethrow_exceptions=True, **p.kwargs
    )
    assert res.iter == 25
    # the CNOT problem sits near its saddle at this iteration count
    # (J_T ~ 2e-2; it escapes to < 1e-6 by iter 40) — the subject here
    # is the line-search economy, not final convergence
    assert res.J_T < 5e-2
    assert res.fg_calls <= 2.0 * res.iter + 2, (res.fg_calls, res.iter)


def test_device_loop_bounds_projection():
    trajs, tlist = _tls()
    res = optimize(
        trajs, tlist, J_T=J_T_sm, iter_stop=25,
        optimizer="device-lbfgs", device_loop_iters=5,
        lower_bound=-0.5, upper_bound=0.5,
        print_iters=False, rethrow_exceptions=True,
    )
    from grape_tpu.controls import discretize_on_midpoints

    pulse = discretize_on_midpoints(res.optimized_controls[0], tlist)
    assert np.max(np.abs(pulse)) <= 0.5 + 1e-12
    assert res.J_T < 0.5


def test_device_loop_envelope_growth_mid_chunk():
    """Unbounded pulses outgrowing the amplitude-envelope bucket
    MID-CHUNK: the stale iterate (produced by the old-envelope program)
    must be discarded, the bucket grown, and the optimization re-seeded
    — converging to the same reference anchor as the host backends
    instead of raising (taylor) or silently recording stale-program
    values (cheby)."""
    def eps(t):  # tiny guess -> small initial bucket; optimum peaks ~0.8
        return 0.05 * float(flattop(t, T=5, t_rise=0.3, func="blackman"))

    H = hamiltonian(-0.5 * sz, (sx, eps))
    tlist = np.linspace(0, 5, 201)
    trajs = [Trajectory([1, 0], H, target_state=[0, 1])]
    from grape_tpu.workspace import GrapeWrk

    buckets = []
    orig_init = GrapeWrk.__init__

    def spy_init(self, *a, **kw):
        orig_init(self, *a, **kw)
        buckets.append(self)

    GrapeWrk.__init__ = spy_init
    try:
        res = optimize(
            trajs, tlist, J_T=J_T_sm, iter_stop=40,
            optimizer="device-lbfgs", device_loop_iters=4,
            prop_method="cheby", gradient_method="taylor",
            print_iters=False, rethrow_exceptions=True,
        )
    finally:
        GrapeWrk.__init__ = orig_init
    wrk = buckets[-1]
    assert res.J_T < 1e-3
    # the optimum (max|eps| ~ 0.8) lies far outside the guess bucket
    # (~0.1): growth must have happened, and every RECORDED iterate must
    # be inside the final bucket
    assert wrk._amp_bucket is not None and max(wrk._amp_bucket) >= 0.8
    from grape_tpu.controls import discretize_on_midpoints

    pulse = discretize_on_midpoints(res.optimized_controls[0], tlist)
    assert np.max(np.abs(pulse)) <= max(wrk._amp_bucket) + 1e-12


def test_device_loop_sharded_matches_single_device():
    """The device-resident chunked loop under ``mesh=...``: the chunk
    program is built with explicit shardings (problem arrays sharded
    along the trajectory axis, pulse vector / optimizer state
    replicated) — a sharded ensemble pays ONE host sync per chunk.  The
    J_T trace must reproduce the unsharded device-loop trace."""
    import jax

    from grape_tpu.parallel import make_mesh

    assert len(jax.devices()) >= 8
    sz_ = np.array([[1, 0], [0, -1]], dtype=complex)
    sx_ = np.array([[0, 1], [1, 0]], dtype=complex)

    def eps(t):
        return 0.2 * float(flattop(t, T=5, t_rise=0.3, func="blackman"))

    base = hamiltonian(-0.5 * sz_, (sx_, eps))
    shared_eps = base.terms[0][1]
    trajs = [
        Trajectory(
            [1, 0],
            hamiltonian(-0.5 * (1.0 + 0.01 * k) * sz_, (sx_, shared_eps)),
            target_state=[0, 1],
        )
        for k in range(8)
    ]
    tlist = np.linspace(0, 5, 101)
    kwargs = dict(
        J_T=J_T_sm, iter_stop=6, print_iters=False,
        rethrow_exceptions=True, optimizer="device-lbfgs",
        device_loop_iters=3,
    )
    tr_plain, tr_mesh = [], []
    res_plain = optimize(
        trajs, tlist,
        callback=lambda w, i: tr_plain.append(float(w.result.J_T)),
        **kwargs,
    )
    res_mesh = optimize(
        trajs, tlist, mesh=make_mesh(8),
        callback=lambda w, i: tr_mesh.append(float(w.result.J_T)),
        **kwargs,
    )
    assert len(tr_mesh) == len(tr_plain) == 7
    np.testing.assert_allclose(tr_mesh, tr_plain, rtol=1e-9, atol=1e-12)
    for c_m, c_p in zip(
        res_mesh.optimized_controls, res_plain.optimized_controls
    ):
        np.testing.assert_allclose(c_m, c_p, atol=1e-9)
    assert res_mesh.J_T < 0.5  # real optimization progress


def test_device_loop_auto_chunk_schedule():
    """chunk_schedule="auto" (the optimizer="auto" default on TPU,
    VERDICT round-4 item 3): one exact probe chunk, then — since the
    measured duration projects safely under the platform's ~1-min
    execution kill — a JUMP straight to the full chunk size (every
    distinct chunk length is a separate compiled program whose first
    execution pays the per-program queue; the old 1->2->4->... ladder
    paid it at every rung).  The math matches the fixed-chunk run
    exactly."""
    from grape_tpu.optimizers.device_loop import DeviceLoopBackend

    trajs, tlist = _tls(101)
    backend = DeviceLoopBackend(chunk_iters=8, chunk_schedule="auto")
    chunk_sizes = []
    orig = backend._make_chunk

    def spy(wrk, n_iters=None):
        chunk_sizes.append(n_iters)
        return orig(wrk, n_iters)

    backend._make_chunk = spy
    tr_auto = []
    # finite bounds -> bound-capped amplitude envelope: no mid-run
    # envelope growths, so the schedule is the pure growth sequence
    bounds = dict(upper_bound=1.0, lower_bound=-1.0)
    res = optimize(
        trajs, tlist, J_T=J_T_sm, iter_stop=7, print_iters=False,
        rethrow_exceptions=True, optimizer=backend,
        callback=lambda w, i: tr_auto.append(float(w.result.J_T)),
        **bounds,
    )
    # schedule: probe chunk 1, then jump to the full chunk size
    assert chunk_sizes == [1, 8]
    # identical math to the fixed chunk=1 run
    tr_fix = []
    optimize(
        trajs, tlist, J_T=J_T_sm, iter_stop=7, print_iters=False,
        rethrow_exceptions=True, optimizer="device-lbfgs",
        device_loop_iters=1,
        callback=lambda w, i: tr_fix.append(float(w.result.J_T)),
        **bounds,
    )
    assert len(tr_auto) == len(tr_fix) == 8
    np.testing.assert_allclose(tr_auto, tr_fix, rtol=1e-9, atol=1e-12)
    assert res.iter == 7


def test_device_loop_auto_schedule_resets_on_mutation():
    """A callback that mutates the pulses is an 'eventful' chunk: the
    auto schedule drops back to chunk=1 (per-iteration mutation
    semantics while the user is intervening)."""
    from grape_tpu.optimizers.device_loop import DeviceLoopBackend

    trajs, tlist = _tls(101)
    backend = DeviceLoopBackend(chunk_iters=8, chunk_schedule="auto")
    chunk_sizes = []  # size of every LAUNCHED chunk (incl. cache reuse)
    orig = backend._make_chunk

    def spy(wrk, n_iters=None):
        fn = orig(wrk, n_iters)

        def logged(*args, _n=n_iters, **kw):
            chunk_sizes.append(_n)
            return fn(*args, **kw)

        return logged

    backend._make_chunk = spy

    def mutate_at_3(wrk, iteration):
        if iteration == 3:
            wrk.pulsevals *= 0.8

    optimize(
        trajs, tlist, J_T=J_T_sm, iter_stop=6, print_iters=False,
        rethrow_exceptions=True, optimizer=backend,
        callback=mutate_at_3, upper_bound=1.0, lower_bound=-1.0,
    )
    # probe 1, jump to 8 (mutation at iteration 3 cuts it short and
    # is an eventful chunk -> reset to exact chunk=1, then jump again)
    assert chunk_sizes[:2] == [1, 8]
    assert chunk_sizes[2] == 1
    assert chunk_sizes == [1, 8, 1, 8]


def test_optimizer_auto_selection():
    """optimizer default ("auto"): device loop with the growing chunk
    schedule on TPU, host C++ L-BFGS-B on CPU, host loop whenever
    fw_prop_callback needs strict per-evaluation host control."""
    import jax

    from grape_tpu.optimize import _get_optimizer
    from grape_tpu.optimizers.device_loop import DeviceLoopBackend
    from grape_tpu.optimizers.lbfgsb import LBFGSB

    class FakeWrk:
        def __init__(self, kwargs, fw_cb=None):
            self.kwargs = kwargs

            class CP:
                fw_prop_callback = fw_cb

            self.cp = CP()

    # CPU (the test platform): default -> host L-BFGS-B
    assert isinstance(_get_optimizer(FakeWrk({})), LBFGSB)
    assert isinstance(_get_optimizer(FakeWrk({"optimizer": "auto"})), LBFGSB)

    # fake TPU platform -> device loop with auto schedule
    class FakeDev:
        platform = "tpu"

    real_devices = jax.devices
    jax.devices = lambda *a, **k: [FakeDev()]
    try:
        opt = _get_optimizer(FakeWrk({}))
        assert isinstance(opt, DeviceLoopBackend)
        assert opt.chunk_schedule == "auto"
        assert opt.chunk_iters == 16
        # fw_prop_callback forces the host loop even on TPU
        opt2 = _get_optimizer(FakeWrk({}, fw_cb=lambda v, t: None))
        assert isinstance(opt2, LBFGSB)
        # explicit backend selection is never overridden
        opt3 = _get_optimizer(FakeWrk({"optimizer": "lbfgsb"}))
        assert isinstance(opt3, LBFGSB)
    finally:
        jax.devices = real_devices
