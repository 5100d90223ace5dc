"""Native host-side runtime components.

The JAX/XLA path owns the device compute; the pieces of the framework that run
on the host between device calls (the assignment solvers driving Decepticon
sentence clustering) are implemented in C++ and loaded via ctypes — the
counterpart of the reference's dependency on the ortools min-cost-flow solver
inside the k_means_constrained package (reference attacks/analytic_attacks.py:
660-680). The shared library is compiled on demand with g++ and cached next to
the source; every entry point has a pure scipy fallback so the package works
without a toolchain.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import tempfile

import numpy as np

log = logging.getLogger(__name__)

_SRC = os.path.join(os.path.dirname(__file__), "capacitated_assignment.cc")
_LIB_PATH = os.path.join(os.path.dirname(__file__), "_capacitated_assignment.so")
_lib = None
_lib_tried = False


def _load_library():
    global _lib, _lib_tried
    if _lib_tried:
        return _lib
    _lib_tried = True
    try:
        if (not os.path.exists(_LIB_PATH)
                or os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC)):
            # build into a temp file then atomically rename, so concurrent
            # test workers never load a half-written library
            fd, tmp = tempfile.mkstemp(suffix=".so", dir=os.path.dirname(_SRC))
            os.close(fd)
            subprocess.run(
                ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                 "-o", tmp, _SRC],
                check=True, capture_output=True, timeout=120)
            os.replace(tmp, _LIB_PATH)
        lib = ctypes.CDLL(_LIB_PATH)
        lib.capacitated_assignment.restype = ctypes.c_int
        lib.capacitated_assignment.argtypes = [
            np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
            ctypes.c_int64, ctypes.c_int64,
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
        ]
        _lib = lib
    except Exception as e:  # no g++, sandboxed exec, ...
        log.warning(f"native assignment solver unavailable ({e}); "
                    "falling back to scipy linear_sum_assignment.")
        _lib = None
    return _lib


def _fallback_capacitated_assignment(cost, caps):
    """Exact reference semantics via LSA on the column-replicated matrix."""
    from scipy.optimize import linear_sum_assignment

    replicated = np.repeat(cost, caps, axis=1)
    owners = np.repeat(np.arange(len(caps)), caps)
    rows, cols = linear_sum_assignment(replicated)
    labels = np.empty(cost.shape[0], np.int64)
    labels[rows] = owners[cols]
    return labels


def capacitated_assignment(cost, caps):
    """Assign each row to one of k clusters minimizing total cost, subject to
    per-cluster capacities. Exact (min-cost-flow optimum).

    Args:
      cost: (n, k) float array.
      caps: int or (k,) int array of cluster capacities; sum(caps) >= n.

    Returns:
      (n,) int64 cluster labels.
    """
    cost = np.ascontiguousarray(cost, np.float64)
    n, k = cost.shape
    caps = np.broadcast_to(np.asarray(caps, np.int64), (k,))
    if caps.sum() < n:
        raise ValueError(f"infeasible: sum of capacities {caps.sum()} < {n} rows")
    lib = _load_library()
    if lib is None:
        return _fallback_capacitated_assignment(cost, np.asarray(caps))
    out = np.empty(n, np.int64)
    rc = lib.capacitated_assignment(cost, n, k, np.ascontiguousarray(caps), out)
    if rc != 0:
        raise ValueError("infeasible capacitated assignment")
    return out
