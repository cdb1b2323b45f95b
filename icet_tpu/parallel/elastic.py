"""Elastic execution: device-failure detection + mesh re-sharding.

The reference's entire failure story is a divergence clamp and exception
swallowing (SURVEY.md section 5.3).  Production TPU fleets lose chips; this
module keeps batched registration running by (a) probing device health with
tiny dispatches, (b) rebuilding the largest usable (dp, sp) mesh from the
healthy set, (c) recompiling the sharded step, and (d) re-padding the batch
to the new mesh divisors — the "elastic re-sharding" target of
BASELINE.md's north star.
"""

from __future__ import annotations

import threading
import time

import numpy as np

import jax
import jax.numpy as jnp

from icet_tpu.config import ICETConfig
from icet_tpu.parallel.sharding import (
    make_sharded_register,
    registration_mesh,
    shard_scan_batch,
)


def _default_probe_op(d) -> bool:
    x = jax.device_put(jnp.ones((8,)), d)
    return float(jnp.sum(x)) == 8.0


def probe_devices(devices=None, timeout_s: float = 60.0, _op=None) -> list:
    """Return the subset of devices that complete a trivial dispatch
    within ``timeout_s`` seconds.

    The dominant real-world failure mode on this hardware is NOT an
    exception but a dispatch that never returns (tunnel hangs forever on
    the first device sync — CLAUDE.md).  Each device is therefore probed
    on its own daemon watchdog thread, all concurrently; a device whose
    probe neither returns nor raises by the deadline is reported
    unhealthy.  A hung probe thread is abandoned (daemon, leaks one
    blocked thread) rather than allowed to freeze the recovery path that
    called us.

    ``_op(device) -> bool`` is injectable for tests (e.g. a probe that
    blocks forever).
    """
    if devices is None:
        devices = jax.devices()
    op = _op or _default_probe_op
    results: dict[int, bool] = {}

    def work(i, d):
        try:
            ok = bool(op(d))
        except Exception:
            ok = False
        results[i] = ok  # GIL-atomic per-key store

    threads = [
        threading.Thread(target=work, args=(i, d), daemon=True)
        for i, d in enumerate(devices)
    ]
    for t in threads:
        t.start()
    deadline = time.monotonic() + timeout_s
    for t in threads:
        t.join(max(0.0, deadline - time.monotonic()))
    return [d for i, d in enumerate(devices) if results.get(i)]


def best_mesh_shape(n_devices: int, prefer_dp: int) -> tuple[int, int]:
    """Largest (dp, sp) grid with dp <= prefer_dp dividing n_devices."""
    for dp in range(min(prefer_dp, n_devices), 0, -1):
        if n_devices % dp == 0:
            return dp, n_devices // dp
    return 1, max(n_devices, 1)


class ElasticRegistrationRunner:
    """Sharded batched registration that survives device loss.

    Usage::

        runner = ElasticRegistrationRunner(cfg, prefer_dp=2)
        res = runner.run(scans1, scans2, x0s)   # (B, N, 3) host arrays

    On a failed dispatch the runner re-probes devices, rebuilds the mesh
    from the healthy subset, recompiles, and retries; ``rebuilds`` counts
    re-sharding events.  ``refresh()`` re-probes eagerly (e.g. after a
    maintenance window returns devices).
    """

    def __init__(
        self,
        cfg: ICETConfig,
        prefer_dp: int = 1,
        devices=None,
        max_retries: int = 2,
    ):
        self.cfg = cfg
        self.prefer_dp = prefer_dp
        self.max_retries = max_retries
        self.rebuilds = 0
        self._devices = list(devices) if devices else list(jax.devices())
        self._build()

    def _build(self):
        if not self._devices:
            raise RuntimeError("no healthy devices remain")
        dp, sp = best_mesh_shape(len(self._devices), self.prefer_dp)
        self.mesh = registration_mesh(dp=dp, sp=sp, devices=self._devices[: dp * sp])
        self._step = make_sharded_register(self.cfg, self.mesh)

    def refresh(self, devices=None):
        self._devices = probe_devices(devices)
        self._build()
        self.rebuilds += 1

    @property
    def shape(self) -> tuple[int, int]:
        return (self.mesh.shape["dp"], self.mesh.shape["sp"])

    def _pad(self, scans1, scans2, x0s):
        dp, sp = self.shape
        b, n = scans1.shape[0], scans1.shape[1]
        pad_b = (-b) % dp
        pad_n = (-n) % sp
        if pad_b:
            # Duplicate the last pair so the batch divides dp; callers slice
            # the result back to b.
            rep = lambda a: np.concatenate([a, np.repeat(a[-1:], pad_b, 0)], 0)
            scans1, scans2, x0s = rep(scans1), rep(scans2), rep(x0s)
        if pad_n:
            z = np.zeros((scans1.shape[0], pad_n, 3), scans1.dtype)
            scans1 = np.concatenate([scans1, z], 1)
            scans2 = np.concatenate([scans2, z], 1)
        return scans1, scans2, x0s, b

    def run(self, scans1, scans2, x0s):
        scans1 = np.asarray(scans1, np.float32)
        scans2 = np.asarray(scans2, np.float32)
        x0s = np.asarray(x0s, np.float32)
        last_err = None
        for _ in range(self.max_retries + 1):
            s1, s2, s0, b = self._pad(scans1, scans2, x0s)
            try:
                args = shard_scan_batch(s1, s2, s0, self.mesh)
                res = self._step(*args)
                jax.block_until_ready(res)
                return jax.tree_util.tree_map(lambda a: np.asarray(a)[:b], res)
            except Exception as e:  # device failure / mesh breakage
                last_err = e
                healthy = probe_devices(self._devices)
                if len(healthy) == len(self._devices):
                    raise  # not a device problem — surface it
                self._devices = healthy
                self._build()
                self.rebuilds += 1
        raise RuntimeError(
            f"elastic retries exhausted ({self.rebuilds} rebuilds)"
        ) from last_err
