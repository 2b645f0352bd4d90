"""Quaternion <-> rotation-matrix conversion, differentiable both ways in JAX.

The reference converts quat->matrix in torch (reference src/common.py:189-228)
but matrix->quat via the CPU-only ``mathutils`` package
(src/common.py:231-253), forcing a GPU->CPU round-trip per tracked frame.
Here both directions are pure JAX: jittable, batchable, and on-device.

Camera pose tensor layout matches the reference: ``[qw, qx, qy, qz, tx, ty, tz]``.
"""

from __future__ import annotations

import jax.numpy as jnp


def quat_to_rotation(quad: jnp.ndarray) -> jnp.ndarray:
    """Quaternion(s) ``[..., 4]`` (w, x, y, z; not necessarily unit) to
    rotation matrix/matrices ``[..., 3, 3]``.

    Uses the same non-normalized form as the reference (src/common.py:189-212):
    ``two_s = 2 / <q, q>`` so a non-unit quaternion still yields a rotation.
    Fully differentiable.
    """
    qr, qi, qj, qk = quad[..., 0], quad[..., 1], quad[..., 2], quad[..., 3]
    two_s = 2.0 / jnp.sum(quad * quad, axis=-1)
    r00 = 1.0 - two_s * (qj**2 + qk**2)
    r01 = two_s * (qi * qj - qk * qr)
    r02 = two_s * (qi * qk + qj * qr)
    r10 = two_s * (qi * qj + qk * qr)
    r11 = 1.0 - two_s * (qi**2 + qk**2)
    r12 = two_s * (qj * qk - qi * qr)
    r20 = two_s * (qi * qk - qj * qr)
    r21 = two_s * (qj * qk + qi * qr)
    r22 = 1.0 - two_s * (qi**2 + qj**2)
    rows = [
        jnp.stack([r00, r01, r02], axis=-1),
        jnp.stack([r10, r11, r12], axis=-1),
        jnp.stack([r20, r21, r22], axis=-1),
    ]
    return jnp.stack(rows, axis=-2)


def pose_matrix_from_tensor(inputs: jnp.ndarray) -> jnp.ndarray:
    """7-vector ``[quat(4), t(3)]`` (or batch ``[..., 7]``) -> ``[..., 3, 4]``
    camera-to-world matrix. Differentiable (used to optimize poses).

    Mirrors reference ``get_camera_from_tensor`` (src/common.py:215-228).
    """
    quad, t = inputs[..., :4], inputs[..., 4:]
    R = quat_to_rotation(quad)
    return jnp.concatenate([R, t[..., :, None]], axis=-1)


def rotation_to_quat(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix ``[..., 3, 3]`` -> unit quaternion ``[..., 4]`` (w,x,y,z).

    Branch-free Shepperd-style conversion (all four candidate quaternions are
    computed; the best-conditioned one is selected with ``where``), replacing
    the reference's CPU ``mathutils.Matrix.to_quaternion`` call
    (src/common.py:242-245). Canonicalized to ``w >= 0``.
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]

    tr = m00 + m11 + m22
    # Four candidates, each valid when its pivot is the largest.
    def safe_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, 1e-12))

    qw0 = safe_sqrt(1.0 + tr) / 2.0
    q0 = jnp.stack(
        [qw0, (m21 - m12) / (4 * qw0), (m02 - m20) / (4 * qw0), (m10 - m01) / (4 * qw0)],
        axis=-1,
    )
    qx1 = safe_sqrt(1.0 + m00 - m11 - m22) / 2.0
    q1 = jnp.stack(
        [(m21 - m12) / (4 * qx1), qx1, (m01 + m10) / (4 * qx1), (m02 + m20) / (4 * qx1)],
        axis=-1,
    )
    qy2 = safe_sqrt(1.0 - m00 + m11 - m22) / 2.0
    q2 = jnp.stack(
        [(m02 - m20) / (4 * qy2), (m01 + m10) / (4 * qy2), qy2, (m12 + m21) / (4 * qy2)],
        axis=-1,
    )
    qz3 = safe_sqrt(1.0 - m00 - m11 + m22) / 2.0
    q3 = jnp.stack(
        [(m10 - m01) / (4 * qz3), (m02 + m20) / (4 * qz3), (m12 + m21) / (4 * qz3), qz3],
        axis=-1,
    )

    # Pick candidate by largest pivot (classic case analysis).
    cond0 = tr > 0.0
    cond1 = (m00 >= m11) & (m00 >= m22)
    cond2 = m11 >= m22
    q = jnp.where(
        cond0[..., None],
        q0,
        jnp.where(cond1[..., None], q1, jnp.where(cond2[..., None], q2, q3)),
    )
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    # canonical sign: w >= 0
    q = jnp.where(q[..., :1] < 0, -q, q)
    return q


def rotation_to_quat_np(R) -> "np.ndarray":
    """Numpy twin of :func:`rotation_to_quat` for host-side pose bookkeeping
    (eager jax ops are expensive on remote-compiled backends)."""
    import numpy as np

    R = np.asarray(R, np.float64)
    m00, m11, m22 = R[0, 0], R[1, 1], R[2, 2]
    tr = m00 + m11 + m22
    if tr > 0:
        qw = np.sqrt(max(1.0 + tr, 1e-12)) / 2
        q = np.array([
            qw,
            (R[2, 1] - R[1, 2]) / (4 * qw),
            (R[0, 2] - R[2, 0]) / (4 * qw),
            (R[1, 0] - R[0, 1]) / (4 * qw),
        ])
    elif m00 >= m11 and m00 >= m22:
        qx = np.sqrt(max(1.0 + m00 - m11 - m22, 1e-12)) / 2
        q = np.array([
            (R[2, 1] - R[1, 2]) / (4 * qx), qx,
            (R[0, 1] + R[1, 0]) / (4 * qx), (R[0, 2] + R[2, 0]) / (4 * qx),
        ])
    elif m11 >= m22:
        qy = np.sqrt(max(1.0 - m00 + m11 - m22, 1e-12)) / 2
        q = np.array([
            (R[0, 2] - R[2, 0]) / (4 * qy),
            (R[0, 1] + R[1, 0]) / (4 * qy), qy,
            (R[1, 2] + R[2, 1]) / (4 * qy),
        ])
    else:
        qz = np.sqrt(max(1.0 - m00 - m11 + m22, 1e-12)) / 2
        q = np.array([
            (R[1, 0] - R[0, 1]) / (4 * qz),
            (R[0, 2] + R[2, 0]) / (4 * qz),
            (R[1, 2] + R[2, 1]) / (4 * qz), qz,
        ])
    q = q / np.linalg.norm(q)
    if q[0] < 0:
        q = -q
    return q


def tensor_from_pose_matrix_np(RT, t_first: bool = False):
    """Numpy twin of :func:`tensor_from_pose_matrix`."""
    import numpy as np

    RT = np.asarray(RT)
    q = rotation_to_quat_np(RT[:3, :3])
    t = RT[:3, 3]
    out = np.concatenate([t, q]) if t_first else np.concatenate([q, t])
    return out.astype(np.float32)


def pose_matrix_from_tensor_np(vec):
    """Numpy twin of :func:`pose_matrix_from_tensor` (-> [3, 4])."""
    import numpy as np

    vec = np.asarray(vec, np.float64)
    q, t = vec[:4], vec[4:]
    qr, qi, qj, qk = q
    two_s = 2.0 / np.dot(q, q)
    R = np.array([
        [1 - two_s * (qj**2 + qk**2), two_s * (qi * qj - qk * qr), two_s * (qi * qk + qj * qr)],
        [two_s * (qi * qj + qk * qr), 1 - two_s * (qi**2 + qk**2), two_s * (qj * qk - qi * qr)],
        [two_s * (qi * qk - qj * qr), two_s * (qj * qk + qi * qr), 1 - two_s * (qi**2 + qj**2)],
    ])
    return np.concatenate([R, t[:, None]], axis=1).astype(np.float32)


def tensor_from_pose_matrix(RT: jnp.ndarray, t_first: bool = False) -> jnp.ndarray:
    """Camera matrix ``[..., 3or4, 4]`` -> 7-vector ``[quat, t]``
    (or ``[t, quat]`` if ``t_first``), matching reference
    ``get_tensor_from_camera`` (src/common.py:231-253) without the CPU hop.
    """
    R = RT[..., :3, :3]
    t = RT[..., :3, 3]
    quad = rotation_to_quat(R)
    if t_first:
        return jnp.concatenate([t, quad], axis=-1)
    return jnp.concatenate([quad, t], axis=-1)
