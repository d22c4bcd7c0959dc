"""Device-mesh sharding for calibration problem batches.

The reference solves independent problems serially (per sensor / pair / rig
loops, SURVEY.md section 2 parallelism table). The TPU-native equivalent is
data parallelism over problems: vmap the solver core over a leading batch
axis and shard that axis across a 1-D device mesh. Problems are
embarrassingly parallel — no intra-solve collectives — so scaling rides ICI
bandwidth-free; only result gathers touch the interconnect.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

BATCH_AXIS = "batch"


def make_mesh(devices: Optional[Sequence] = None, axis_name: str = BATCH_AXIS) -> Mesh:
    """1-D mesh over all (or given) devices."""
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.array(devices), (axis_name,))


def _transfer_ok(device) -> bool:
    """True iff a tiny host->device transfer actually succeeds on ``device``.

    Listing devices is NOT proof they work: a version-skewed TPU tunnel
    enumerates fine and then fails every ``device_put`` with
    FAILED_PRECONDITION "libtpu version mismatch" (the round-2 driver
    failure, MULTICHIP_r02.json). Probing with a 1-element transfer is the
    only reliable health check that doesn't compile anything.
    """
    try:
        jax.device_put(np.zeros((1,)), device).block_until_ready()
        return True
    except Exception:
        return False


def mesh_devices(n_devices: Optional[int] = None, probe: bool = False):
    """Pick devices for a problem-batch mesh, preferring the backend that can
    actually field ``n_devices`` of them.

    Order: (1) the default backend if it has enough devices (a real pod),
    (2) the host CPU backend (virtual ``--xla_force_host_platform_device_count``
    mesh used for sharding validation). Asking for the CPU backend explicitly
    — never relying on platform selection — matters in mixed attachments where
    the default client is a (possibly version-skewed) TPU tunnel; committing
    an array through it is what a multi-chip dryrun must never do.

    With ``probe=True`` a candidate backend is only accepted after a tiny
    host->device transfer succeeds on it (see ``_transfer_ok``) — the
    multi-chip dryrun uses this so a skewed-but-enumerable TPU pool falls
    through to the CPU mesh instead of aborting at the first device_put.

    Returns the device list, or None if no backend has enough devices.
    """
    want = n_devices or 1

    def pick(devs):
        if len(devs) < want:
            return None
        chosen = devs[:want] if n_devices else devs
        # probe EVERY chosen device: per-chip skew exists (a pool where
        # device 0 transfers fine while others raise) and the first
        # device_put onto an unprobed device would abort the dryrun anyway
        if probe and not all(_transfer_ok(d) for d in chosen):
            return None
        return chosen

    got = pick(jax.devices())
    if got is not None:
        return got
    try:
        cpus = jax.devices("cpu")
    except RuntimeError:
        cpus = []
    return pick(cpus)


def batch_sharding(mesh: Mesh, axis_name: str = BATCH_AXIS) -> NamedSharding:
    """Shard the leading (problem) axis; replicate everything after it."""
    return NamedSharding(mesh, P(axis_name))


def shard_batch(tree, mesh: Mesh, axis_name: str = BATCH_AXIS):
    """Place every leaf with its leading axis sharded over the mesh.

    Leaves whose leading dimension is not divisible by the mesh size are
    replicated (callers should pad the batch; see ``pad_batch``).

    Host (numpy) leaves are device_put straight onto the mesh — never
    committed to the default device first, which would route them through
    whatever client owns the default platform (on a mixed CPU/TPU attachment
    that client can be unusable). Device leaves living on a different backend
    than the mesh hop via the host.
    """
    n = mesh.devices.size
    sharding = batch_sharding(mesh, axis_name)
    repl = NamedSharding(mesh, P())
    mesh_platform = mesh.devices.flat[0].platform

    def place(x):
        if isinstance(x, jax.Array):
            if next(iter(x.devices())).platform != mesh_platform:
                x = np.asarray(x)
        else:
            x = np.asarray(x)
        if getattr(x, "ndim", 0) >= 1 and x.shape[0] % n == 0:
            return jax.device_put(x, sharding)
        if n > 1 and getattr(x, "ndim", 0) >= 1 and x.shape[0] > n:
            # batch-like leaf that doesn't divide the mesh: replicating is a
            # silent n-x memory/compute loss — tell the caller to pad
            import warnings

            warnings.warn(
                f"shard_batch: leading axis {x.shape[0]} does not divide the "
                f"{n}-device mesh — leaf will be REPLICATED. Pad the batch "
                f"first with parallel.pad_batch.",
                stacklevel=3,
            )
        return jax.device_put(x, repl)

    return jax.tree_util.tree_map(place, tree)


def pad_batch(tree, multiple: int):
    """Pad the leading axis of every leaf up to a multiple (with edge copies)
    so the batch divides the mesh. Returns (padded_tree, real_count)."""
    leaves = jax.tree_util.tree_leaves(tree)
    b = leaves[0].shape[0]
    target = ((b + multiple - 1) // multiple) * multiple
    if target == b:
        return tree, b

    reps = np.concatenate([np.arange(b), np.zeros(target - b, int)])

    def pad(x):
        # plain fancy indexing: numpy leaves stay host-side numpy (the
        # shard-path discipline — never commit through the default client),
        # jax leaves gather on their own device
        if isinstance(x, jax.Array):
            return x[reps]
        return np.asarray(x)[reps]

    return jax.tree_util.tree_map(pad, tree), b
