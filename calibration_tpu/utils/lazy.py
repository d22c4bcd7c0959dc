"""Deferred device->host fetches.

On the tunneled TPU attachment every device->host transfer pays a ~27ms
round-trip latency plus ~8MB/s streaming (measured 2026-08-19: a 2KB fetch
blocks 27ms, a 1.1MB ambient covariance batch 128ms). Results that callers
usually never read — e.g. the per-sensor ambient covariance inside pipeline
stage results, which the reference writes into reports only for hand-eye and
bundle (handeye_stage.cpp:173-175, bundle_stage.cpp:128-130), never for
intrinsics — are returned as :class:`LazyDeviceArray` and fetched only on
first use.

A whole batch shares one :class:`BatchFetcher`: the first access by any lane
fetches the full batched array once, then every lane slices host-side numpy
(per-lane fetches would pay one round trip per lane — the round-3 lesson in
CLAUDE.md).
"""

from __future__ import annotations

from typing import Any, Optional

import numpy as np


class BatchFetcher:
    """Holds a device array; materializes the whole thing once on demand."""

    __slots__ = ("_device", "_host")

    def __init__(self, device_array: Any):
        self._device = device_array
        self._host: Optional[np.ndarray] = None

    def get(self) -> np.ndarray:
        if self._host is None:
            import jax

            self._host = np.asarray(jax.device_get(self._device))
            self._device = None  # free device/handle reference
        return self._host


class LazyDeviceArray:
    """One lane of a batched device result, fetched on first use.

    Duck-types the read surface numpy consumers rely on (``np.asarray``,
    ``tolist``, indexing, ``shape``/``dtype``, iteration, arithmetic via
    ``__array__``). ``is not None`` checks behave like a present array.
    """

    __slots__ = ("_fetcher", "_index")

    def __init__(self, fetcher: BatchFetcher, index: Optional[int] = None):
        self._fetcher = fetcher
        self._index = index

    def materialize(self) -> np.ndarray:
        arr = self._fetcher.get()
        return arr if self._index is None else arr[self._index]

    # numpy protocol — np.asarray / ufuncs / allclose all come through here
    def __array__(self, dtype=None, copy=None):
        arr = self.materialize()
        if dtype is not None:
            arr = arr.astype(dtype, copy=False)
        if copy:
            arr = arr.copy()
        return arr

    def tolist(self):
        return self.materialize().tolist()

    def __getitem__(self, key):
        return self.materialize()[key]

    def __len__(self):
        return len(self.materialize())

    def __iter__(self):
        return iter(self.materialize())

    @property
    def shape(self):
        return self.materialize().shape

    @property
    def dtype(self):
        return self.materialize().dtype

    @property
    def ndim(self):
        return self.materialize().ndim

    def __matmul__(self, other):
        return self.materialize() @ other

    def __rmatmul__(self, other):
        return other @ self.materialize()

    def __add__(self, other):
        return self.materialize() + other

    def __radd__(self, other):
        return other + self.materialize()

    def __sub__(self, other):
        return self.materialize() - other

    def __rsub__(self, other):
        return other - self.materialize()

    def __mul__(self, other):
        return self.materialize() * other

    def __rmul__(self, other):
        return other * self.materialize()

    def __neg__(self):
        return -self.materialize()

    def __repr__(self):
        state = "pending" if self._fetcher._host is None else "materialized"
        return f"LazyDeviceArray({state}, index={self._index})"
