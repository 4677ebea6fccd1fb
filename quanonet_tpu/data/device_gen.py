"""
Device-side data generation — a jit/vmap fast path for the ground-truth
pipeline (BASELINE.md north star: keep datagen -> device feed -> circuit ->
optimizer device-resident).

The host path (quanonet_tpu/data/generation.py) retains the reference's
exact NumPy/SciPy semantics for cached-dataset reproducibility; this path
generates the SAME distributions on-device, orders of magnitude faster:

* GRF sampling = one (batch, 1024) normal draw x Cholesky factor x linear
  interpolation matrix — two MXU matmuls (the reference recomputes a
  1024^3 Cholesky and solves per sample on host);
* ODE ground truths via fixed-step RK4 under lax.scan (the reference uses
  SciPy RK45; both are O(h^4) on these smooth GRF inputs);
* Advection (upwind) and reaction-diffusion (explicit Euler) as scanned
  stencils with the reference's grids, CFL choices and subsampling quirks.

Deliberate delta (documented): samples are drawn with jax.random, so they
are distribution-identical but not bit-identical to the host path.
"""
from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from quanonet_tpu.data.generation import _GRF_N, _grf_cholesky

ODE_NAMES = ('Identity', 'Antideriv', 'Homogeneous', 'Nonlinear')


@lru_cache(maxsize=16)
def _interp_matrix(n_src: int, n_dst: int) -> np.ndarray:
    """Dense linear-interpolation matrix from linspace(0,1,n_src) to
    linspace(0,1,n_dst): u_dst = u_src @ W.T, W (n_dst, n_src)."""
    x_dst = np.linspace(0, 1, n_dst)
    pos = x_dst * (n_src - 1)
    lo = np.clip(np.floor(pos).astype(int), 0, n_src - 2)
    frac = pos - lo
    w = np.zeros((n_dst, n_src), np.float32)
    w[np.arange(n_dst), lo] = 1.0 - frac
    w[np.arange(n_dst), lo + 1] = frac
    return w


def sample_grf(key, batch, m, length_scale=0.2):
    """(batch, m) GRF samples on linspace(0,1,m) — same covariance as the
    host sampler (generation.py:37-63)."""
    L = jnp.asarray(_grf_cholesky(float(length_scale)).astype(np.float32))
    z = jax.random.normal(key, (batch, _GRF_N), jnp.float32)
    full = z @ L.T                                  # (batch, 1024)
    w = jnp.asarray(_interp_matrix(_GRF_N, m))
    return full @ w.T, full


def _ode_rhs(name):
    if name == 'Antideriv':
        return lambda u, f: f
    if name == 'Homogeneous':
        return lambda u, f: u + f
    if name == 'Nonlinear':
        return lambda u, f: f - u ** 3
    raise ValueError(name)


def solve_ode_batch(name, u0_full, num_cal):
    """RK4-integrate du/dx = rhs(u, u0(x)) on linspace(0,1,num_cal), y0=0.

    u0_full: (batch, 1024) GRF values on the high-res grid (the integrand
    is evaluated at half-steps via the dense interpolation matrix).
    """
    if name == 'Identity':
        w = jnp.asarray(_interp_matrix(_GRF_N, num_cal))
        return u0_full @ w.T
    rhs = _ode_rhs(name)
    # u0 at all grid points AND half-steps: 2*num_cal-1 points
    n_half = 2 * num_cal - 1
    w = jnp.asarray(_interp_matrix(_GRF_N, n_half))
    f_half = u0_full @ w.T                          # (batch, 2*num_cal-1)
    h = 1.0 / (num_cal - 1)

    def step(u, fs):
        f0, fm, f1 = fs                             # f(x), f(x+h/2), f(x+h)
        k1 = rhs(u, f0)
        k2 = rhs(u + 0.5 * h * k1, fm)
        k3 = rhs(u + 0.5 * h * k2, fm)
        k4 = rhs(u + h * k3, f1)
        u_next = u + (h / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4)
        return u_next, u_next

    batch = u0_full.shape[0]
    f0s = f_half[:, 0:-2:2].T                       # (num_cal-1, batch)
    fms = f_half[:, 1:-1:2].T
    f1s = f_half[:, 2::2].T
    u_init = jnp.zeros((batch,), jnp.float32)
    _, traj = jax.lax.scan(step, u_init, (f0s, fms, f1s))
    return jnp.concatenate([u_init[None, :], traj], axis=0).T  # (batch, nc)


def solve_advection_batch(u0, c=1.0):
    """Vectorised upwind advection (generation.py solve_advection_pde
    semantics: CFL 0.8, periodic, time-resampled to num_cal columns)."""
    batch, num_cal = u0.shape
    dx = 1.0 / (num_cal - 1)
    dt = 0.8 * dx / abs(c)
    num_t = int(1.0 / dt)
    lam = c * dt / dx

    def step(u, _):
        u_next = u - lam * (u - jnp.roll(u, 1, axis=1))
        return u_next, u_next

    _, traj = jax.lax.scan(step, u0, None, length=num_t - 1)
    traj = jnp.concatenate([u0[None], traj], axis=0)  # (num_t, batch, nc)
    # resample the time axis to num_cal columns
    if num_t > num_cal:
        t_idx = np.linspace(0, num_t - 1, num_cal).astype(int)
        traj = traj[t_idx]
    else:
        w = jnp.asarray(_interp_matrix(num_t, num_cal))
        traj = jnp.einsum('ct,tbn->cbn', w, traj)
    return traj.transpose(1, 2, 0)                    # (batch, x, t)


def solve_rdiffusion_batch(u0, D=0.01, k=0.01):
    """Vectorised explicit-Euler reaction-diffusion
    (generation.py solve_rdiffusion_pde semantics incl. the early-time
    subsampling quirk)."""
    batch, num_cal = u0.shape
    dx = 1.0 / (num_cal - 1)
    dt = min(dx ** 2 / (2 * D), 1.0 / (num_cal - 1))
    num_t = int(1 // dt)

    def step(u, _):
        lap = (u[:, 2:] - 2 * u[:, 1:-1] + u[:, :-2]) / dx ** 2
        interior = u[:, 1:-1] + dt * (D * lap + k * u[:, 1:-1] ** 2
                                      + u0[:, 1:-1])
        u_next = jnp.pad(interior, ((0, 0), (1, 1)))
        return u_next, u_next

    u_init = jnp.zeros_like(u0)
    _, traj = jax.lax.scan(step, u_init, None, length=num_t - 1)
    traj = jnp.concatenate([u_init[None], traj], axis=0)  # (num_t, b, nc)
    stride = max(1, num_t // num_cal)
    traj = traj[::stride][:num_cal]
    return traj.transpose(1, 2, 0)                        # (batch, x, t)


@partial(jax.jit, static_argnames=('operator', 'batch', 'num_points',
                                   'num_points_0', 'num_cal',
                                   'length_scale'))
def generate_ode_batch(key, operator, batch, num_points, num_points_0,
                       num_cal=1000, length_scale=0.2):
    """Fully device-side: (u0 at num_points_0, u at num_points)."""
    u0_m, u0_full = sample_grf(key, batch, num_points_0, length_scale)
    u_cal = solve_ode_batch(operator, u0_full, num_cal)
    w_out = jnp.asarray(_interp_matrix(num_cal, num_points))
    return u0_m, u_cal @ w_out.T


def solve_darcy_batch(u0, K=0.1, f=-1.0, cg_tol=1e-6, cg_maxiter=2000):
    """Device-side Darcy: -∇·(K∇u) = f on the unit square with Dirichlet
    boundary from a 1-D field of length 4*num_cal (host semantics:
    generation.py solve_darcy_pde).  The boundary unknowns are eliminated
    so the interior system is SPD and solved with conjugate gradients
    (jax.scipy.sparse.linalg.cg) using a matvec built from padded shifts —
    no sparse matrix materialised.

    u0: (batch, 4*num_cal).  Returns (batch, num_cal, num_cal).
    """
    from jax.scipy.sparse.linalg import cg

    batch = u0.shape[0]
    num_cal = u0.shape[1] // 4
    nx = ny = num_cal
    dx = 1.0 / (nx - 1)
    inv_h2 = 1.0 / dx ** 2

    edge = num_cal
    left = u0[:, :edge]                       # u[0, j]    indexed by j
    top = u0[:, edge:2 * edge]                # u[i, ny-1] indexed by i
    right = u0[:, 2 * edge:3 * edge][:, ::-1]  # u[nx-1, j] indexed by j
    bottom = u0[:, 3 * edge:][:, ::-1]        # u[i, 0]    indexed by i

    # full-grid boundary frame (interior zero)
    g = jnp.zeros((batch, nx, ny), u0.dtype)
    g = g.at[:, :, 0].set(bottom)
    g = g.at[:, :, -1].set(top)
    g = g.at[:, 0, :].set(left)
    g = g.at[:, -1, :].set(right)
    # the reference's if/elif precedence: bottom/top rows win at corners
    g = g.at[:, :, 0].set(bottom)
    g = g.at[:, :, -1].set(top)

    # interior SPD system: (-Lap) u = f/K + boundary/h^2 contributions
    def neg_lap(v):  # v: (batch, nx-2, ny-2)
        vp = jnp.pad(v, ((0, 0), (1, 1), (1, 1)))
        return (4.0 * v - vp[:, :-2, 1:-1] - vp[:, 2:, 1:-1]
                - vp[:, 1:-1, :-2] - vp[:, 1:-1, 2:]) * inv_h2

    rhs = jnp.full((batch, nx - 2, ny - 2), f / K, u0.dtype)
    rhs = rhs + (g[:, 0:-2, 1:-1] + g[:, 2:, 1:-1]
                 + g[:, 1:-1, 0:-2] + g[:, 1:-1, 2:]) * inv_h2

    u_int, _ = cg(neg_lap, rhs, tol=cg_tol, maxiter=cg_maxiter)
    return g.at[:, 1:-1, 1:-1].set(u_int)


def _host_contract(u0, u, num_train, num_test):
    """Random train/test split on the process-global NumPy RNG — the same
    split semantics as the host generators (generation.py:181-189)."""
    n = num_train + num_test
    train_index = np.random.choice(n, num_train, replace=False)
    test_index = np.setdiff1d(np.arange(n), train_index)
    u0 = np.asarray(u0, np.float32)
    u = np.asarray(u, np.float32)
    return (u0[train_index], u[train_index], u0[test_index], u[test_index])


def _device_key():
    """One jax key per generation call, folded from the global NumPy RNG
    so launch-time seeding (config.set_random_seed) stays deterministic."""
    return jax.random.PRNGKey(int(np.random.randint(0, 2 ** 31 - 1)))


def generate_ode_operator_data_device(operator_type, num_train, num_test,
                                      num_points, num_points_0,
                                      length_scale=0.2, num_cal=1000,
                                      input_sampler=None, key=None):
    """Drop-in replacement for generation.generate_ode_operator_data that
    runs GRF sampling + RK4 integration on-device (same 5-tuple return
    contract).  Distribution-identical but NOT bit-identical to the host
    path (jax.random vs numpy; RK4 vs RK45 at ~1e-3) — DataManager caches
    it under a distinct ``_dgdevice`` filename."""
    if input_sampler is not None:
        raise ValueError("device datagen does not support input_sampler; "
                         "use the host path for custom input functions")
    num_cal = 1000 if num_cal is None else num_cal
    n = num_train + num_test
    u0, u = generate_ode_batch(key if key is not None else _device_key(),
                               operator_type, n, num_points, num_points_0,
                               num_cal=num_cal, length_scale=length_scale)
    x_target = np.linspace(0, 1, num_points).astype(np.float32)
    return (*_host_contract(u0, u, num_train, num_test), x_target)


def generate_pde_operator_data_device(operator_type, num_train, num_test,
                                      num_points, num_points_0,
                                      length_scale=0.2, num_cal=100,
                                      input_sampler=None, key=None):
    """PDE analogue of generate_ode_operator_data_device (6-tuple return
    contract, incl. t_target)."""
    if input_sampler is not None:
        raise ValueError("device datagen does not support input_sampler; "
                         "use the host path for custom input functions")
    num_cal = 100 if num_cal is None else num_cal
    n = num_train + num_test
    u0, u = generate_pde_batch(key if key is not None else _device_key(),
                               operator_type, n, num_points, num_points_0,
                               num_cal=num_cal, length_scale=length_scale)
    x_target = np.linspace(0, 1, num_points).astype(np.float32)
    return (*_host_contract(u0, u, num_train, num_test),
            x_target, x_target.copy())


@partial(jax.jit, static_argnames=('operator', 'batch', 'num_points',
                                   'num_points_0', 'num_cal',
                                   'length_scale'))
def generate_pde_batch(key, operator, batch, num_points, num_points_0,
                       num_cal=100, length_scale=0.2):
    """Device-side Advection / RDiffusion / Darcy: returns (u0 (b, p0),
    u (b, num_points, num_points))."""
    if operator == 'Darcy':
        # boundary field of length 4*num_cal (host semantics)
        u0_cal, _ = sample_grf(key, batch, 4 * num_cal, length_scale)
        u = solve_darcy_batch(u0_cal)
        w0 = jnp.asarray(_interp_matrix(4 * num_cal, num_points_0))
    elif operator == 'Advection':
        u0_cal, _ = sample_grf(key, batch, num_cal, length_scale)
        u = solve_advection_batch(u0_cal)
        w0 = jnp.asarray(_interp_matrix(num_cal, num_points_0))
    elif operator == 'RDiffusion':
        u0_cal, _ = sample_grf(key, batch, num_cal, length_scale)
        u = solve_rdiffusion_batch(u0_cal)
        w0 = jnp.asarray(_interp_matrix(num_cal, num_points_0))
    else:
        raise ValueError(f"device-side PDE gen supports Advection/"
                         f"RDiffusion/Darcy, not {operator}")
    wx = jnp.asarray(_interp_matrix(num_cal, num_points))
    wt = jnp.asarray(_interp_matrix(u.shape[2], num_points))
    u_out = jnp.einsum('pi,bij,qj->bpq', wx, u, wt)
    return u0_cal @ w0.T, u_out
