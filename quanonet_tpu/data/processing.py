"""
Encoders: (u0, u) function pairs -> model-ready arrays
(reference data_utils/data_processing.py).

* ode_encode / pde_encode: (branch, trunk, output) triples with per-function
  random point subsampling (without replacement);
* ode_fncode / pde_fncode: FNO grid format (N, pts[, pts], channels).
"""
import numpy as np
from scipy import interpolate


def ode_encode(generate_data, num_train, num_test, num_points, num_points_0,
               train_sample_num, test_sample_num, num_cal=None):
    """Reference data_processing.py:10-43."""
    u0_train, u_train, u0_test, u_test, x = generate_data(
        num_train, num_test, num_points, num_points_0, num_cal=num_cal)

    x_trunk = x.reshape(-1, 1)
    train_indices = np.array([
        np.random.choice(num_points, train_sample_num, replace=False)
        for _ in range(num_train)])
    test_indices = np.array([
        np.random.choice(num_points, test_sample_num, replace=False)
        for _ in range(num_test)])

    u_train_flat = u_train.reshape(num_train, -1)
    u_test_flat = u_test.reshape(num_test, -1)
    train_output = u_train_flat[np.arange(num_train)[:, None],
                                train_indices].reshape(-1, 1)
    test_output = u_test_flat[np.arange(num_test)[:, None],
                              test_indices].reshape(-1, 1)

    train_trunk_input = x_trunk[train_indices.flatten()]
    test_trunk_input = x_trunk[test_indices.flatten()]
    train_branch_input = np.repeat(u0_train, train_sample_num, axis=0)
    test_branch_input = np.repeat(u0_test, test_sample_num, axis=0)
    return (train_branch_input, train_trunk_input, train_output,
            test_branch_input, test_trunk_input, test_output)


def pde_encode(generate_data, num_train, num_test, num_points, num_points_0,
               train_sample_num, test_sample_num, num_cal=None):
    """Reference data_processing.py:83-123 — trunk = (x, t) pairs from the
    'ij' meshgrid flattening."""
    u0_train, u_train, u0_test, u_test, x, t = generate_data(
        num_train, num_test, num_points, num_points_0, num_cal=num_cal)

    x_repeat = np.repeat(x, len(t)).reshape(-1, 1)
    t_tile = np.tile(t, len(x)).reshape(-1, 1)
    grid_coords = np.concatenate((x_repeat, t_tile), axis=1)
    total_points = len(x) * len(t)

    train_indices = np.array([
        np.random.choice(total_points, train_sample_num, replace=False)
        for _ in range(num_train)])
    test_indices = np.array([
        np.random.choice(total_points, test_sample_num, replace=False)
        for _ in range(num_test)])

    train_branch_input = np.repeat(u0_train, train_sample_num, axis=0)
    test_branch_input = np.repeat(u0_test, test_sample_num, axis=0)
    train_trunk_input = grid_coords[train_indices.flatten()]
    test_trunk_input = grid_coords[test_indices.flatten()]

    u_train_flat = u_train.reshape(num_train, -1)
    u_test_flat = u_test.reshape(num_test, -1)
    train_output = u_train_flat[np.arange(num_train)[:, None],
                                train_indices].reshape(-1, 1)
    test_output = u_test_flat[np.arange(num_test)[:, None],
                              test_indices].reshape(-1, 1)
    return (train_branch_input, train_trunk_input, train_output,
            test_branch_input, test_trunk_input, test_output)


def ode_fncode(generate_data, num_train, num_test, num_points, num_cal=None):
    """FNO 1-D grid encoding (reference data_processing.py:45-81):
    input (N, pts, 2) = (u0, x)."""
    train_v, train_u, test_v, test_u, _ = generate_data(
        num_train, num_test, num_points, num_points, num_cal=num_cal)

    current_dim = train_v.shape[1]
    if current_dim != num_points:
        x_old = np.linspace(0, 1, current_dim)
        x_new = np.linspace(0, 1, num_points)
        train_v = interpolate.interp1d(x_old, train_v, axis=1,
                                       kind='linear')(x_new)
        test_v = interpolate.interp1d(x_old, test_v, axis=1,
                                      kind='linear')(x_new)

    x_grid = np.linspace(0, 1, num_points).astype(np.float32)
    train_input = np.concatenate(
        (train_v[:, :, None], np.tile(x_grid, (num_train, 1))[:, :, None]),
        axis=2)
    test_input = np.concatenate(
        (test_v[:, :, None], np.tile(x_grid, (num_test, 1))[:, :, None]),
        axis=2)
    return (train_input.astype(np.float32), None,
            train_u[:, :, None].astype(np.float32),
            test_input.astype(np.float32), None,
            test_u[:, :, None].astype(np.float32))


def pde_fncode(generate_data, num_train, num_test, num_points, num_cal=None):
    """FNO 2-D -> flattened-1-D encoding (reference data_processing.py:126-163):
    input (N, pts^2, 3) = (u0 broadcast, x, t)."""
    train_v, train_u, test_v, test_u, x, t = generate_data(
        num_train, num_test, num_points, num_points, num_cal=num_cal)

    batch_train = train_v.shape[0]
    batch_test = test_v.shape[0]
    X, T = np.meshgrid(x, t, indexing='ij')
    x_flat, t_flat = X.flatten(), T.flatten()
    total_points = num_points * num_points

    train_v_flat = np.repeat(train_v[:, :, None], num_points,
                             axis=2).reshape(batch_train, total_points)
    test_v_flat = np.repeat(test_v[:, :, None], num_points,
                            axis=2).reshape(batch_test, total_points)

    train_input = np.stack((train_v_flat,
                            np.tile(x_flat, (batch_train, 1)),
                            np.tile(t_flat, (batch_train, 1))), axis=2)
    test_input = np.stack((test_v_flat,
                           np.tile(x_flat, (batch_test, 1)),
                           np.tile(t_flat, (batch_test, 1))), axis=2)
    return (train_input.astype(np.float32), None,
            train_u.reshape(batch_train, total_points, 1).astype(np.float32),
            test_input.astype(np.float32), None,
            test_u.reshape(batch_test, total_points, 1).astype(np.float32))
