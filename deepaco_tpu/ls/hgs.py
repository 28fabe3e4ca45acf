"""ctypes binding for the native CVRP local-search engine (SWAP* + RI moves).

Replaces the reference's HGS-CVRP ctypes wrapper (cvrp_nls/swapstar.py): same
role — polish ACO-constructed routes with strong CVRP local search — but the
route exchange is a single in-memory array round-trip instead of the
reference's ``/tmp/route-{callid}`` file handshake (swapstar.py:240-269),
and the library is our own implementation (see native/cvrp_ls.cpp).

API mirrors the reference wrapper:
  ``swapstar(demands, dist, routes, count)``   (cvrp_nls/swapstar.py:324-346)
  ``neural_swapstar(...)``                     (cvrp_nls/aco.py:443-448)
  ``multiple_swap_star(...)``                  (cvrp_nls/aco.py:113-126)
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from concurrent.futures import ThreadPoolExecutor

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libcvrpls.so")
_lock = threading.Lock()
_lib = None


def _build_library():
    subprocess.run(["make", "-s"], cwd=_NATIVE_DIR, check=True)


def get_library():
    """Load (building on first use) the native library."""
    global _lib
    with _lock:
        if _lib is None:
            src = os.path.join(_NATIVE_DIR, "cvrp_ls.cpp")
            if (not os.path.exists(_LIB_PATH)
                    or os.path.getmtime(_LIB_PATH) < os.path.getmtime(src)):
                _build_library()
            lib = ctypes.CDLL(_LIB_PATH)
            lib.cvrp_local_search.restype = ctypes.c_int
            lib.cvrp_local_search.argtypes = [
                ctypes.c_int,                       # n
                ctypes.POINTER(ctypes.c_double),    # dist
                ctypes.POINTER(ctypes.c_double),    # demands
                ctypes.c_double,                    # capacity
                ctypes.POINTER(ctypes.c_int),       # routes_flat
                ctypes.POINTER(ctypes.c_int),       # route_lens
                ctypes.c_int,                       # n_routes
                ctypes.c_int,                       # count_limit
                ctypes.c_int,                       # k_granular
                ctypes.c_int,                       # use_swap_star
            ]
            lib.cvrp_solve.restype = ctypes.c_double
            lib.cvrp_solve.argtypes = [
                ctypes.c_int,                       # n
                ctypes.POINTER(ctypes.c_double),    # dist
                ctypes.POINTER(ctypes.c_double),    # demands
                ctypes.c_double,                    # capacity
                ctypes.c_int,                       # max_iters
                ctypes.c_int,                       # no_improve_limit
                ctypes.c_double,                    # time_limit_s
                ctypes.c_uint,                      # seed
                ctypes.c_int,                       # ls_count
                ctypes.c_int,                       # k_granular
                ctypes.POINTER(ctypes.c_int),       # routes_flat out
                ctypes.POINTER(ctypes.c_int),       # route_lens out
                ctypes.POINTER(ctypes.c_int),       # n_routes out
            ]
            lib.cvrp_solution_cost.restype = ctypes.c_double
            lib.cvrp_solution_cost.argtypes = [
                ctypes.c_int, ctypes.POINTER(ctypes.c_double),
                ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
                ctypes.c_int]
            _lib = lib
    return _lib


def path_to_routes(path) -> list[np.ndarray]:
    """Split a depot-delimited ant path (0 c.. 0 c.. 0 ...) into customer
    routes (the analog of get_subroutes, cvrp_nls/aco.py:12-23)."""
    path = np.asarray(path)
    zeros = np.nonzero(path == 0)[0]
    routes = []
    for a, b in zip(zeros, zeros[1:]):
        if b - a > 1:
            routes.append(path[a + 1:b].astype(np.int32))
    tail = path[zeros[-1] + 1:] if len(zeros) else path
    if len(tail):
        routes.append(tail.astype(np.int32))
    return routes


def routes_to_path(routes, length: int | None = None) -> np.ndarray:
    """Merge routes back into a depot-delimited path (merge_subroutes,
    cvrp_nls/aco.py:25-33), optionally padded with trailing depot zeros."""
    parts = [np.zeros(1, np.int64)]
    for r in routes:
        if len(r):
            parts.append(np.asarray(r, np.int64))
            parts.append(np.zeros(1, np.int64))
    path = np.concatenate(parts)
    if length is not None:
        assert len(path) <= length, "merged path exceeds horizon"
        path = np.concatenate([path, np.zeros(length - len(path), np.int64)])
    return path


def swapstar(demands, dist, routes, count: int = 1000, k_granular: int = 20,
             use_swap_star: bool = True) -> list[np.ndarray]:
    """Improve ``routes`` (list of customer arrays) under ``dist``.

    Mirrors the reference ``swapstar`` entry (cvrp_nls/swapstar.py:324-346):
    demands/dist are instance data; ``count`` caps applied moves. Returns the
    improved routes; on any native error the input routes are returned
    unchanged (reference behavior, swapstar.py:341-346).
    """
    lib = get_library()
    dist = np.ascontiguousarray(dist, np.float64)
    demands = np.ascontiguousarray(demands, np.float64)
    n = dist.shape[0]
    routes = [np.asarray(r, np.int32) for r in routes if len(r)]
    if not routes:
        return routes
    total = sum(len(r) for r in routes)
    # capacity head-room for write-back (#routes can only shrink)
    flat = np.zeros(total, np.int32)
    lens = np.zeros(len(routes), np.int32)
    off = 0
    for i, r in enumerate(routes):
        flat[off:off + len(r)] = r
        lens[i] = len(r)
        off += len(r)
    try:
        out_r = lib.cvrp_local_search(
            n,
            dist.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            demands.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            ctypes.c_double(1.0 + 1e-9),  # demands normalized to capacity 1
            flat.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            len(routes), count, k_granular, int(use_swap_star))
    except Exception:
        return routes
    out, off = [], 0
    for i in range(out_r):
        out.append(flat[off:off + lens[i]].copy())
        off += lens[i]
    return out


def solve_cvrp(demands, dist, capacity: float = 1.0, max_iters: int = 2000,
               no_improve_limit: int = 500, time_limit_s: float = 0.0,
               seed: int = 0, ls_count: int = 100000, k_granular: int = 20):
    """Standalone hybrid genetic search for one CVRP instance.

    The equivalent of the reference's ``solve_cvrp*`` C entries
    (cvrp_nls/HGS-CVRP-main/Program/C_Interface.cpp:50-127) backed by the
    Genetic/Population/Split tier (SURVEY §2.2 N5): giant-tour chromosomes,
    optimal Split decoding, OX crossover, local-search education, biased
    fitness population management. Returns ``(routes, cost)``.
    """
    lib = get_library()
    dist = np.ascontiguousarray(dist, np.float64)
    demands = np.ascontiguousarray(demands, np.float64)
    n = dist.shape[0]
    flat = np.zeros(max(n - 1, 1), np.int32)
    lens = np.zeros(max(n, 1), np.int32)
    n_routes = ctypes.c_int(0)
    cost = lib.cvrp_solve(
        n,
        dist.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        demands.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ctypes.c_double(capacity), max_iters, no_improve_limit,
        ctypes.c_double(time_limit_s), ctypes.c_uint(seed), ls_count,
        k_granular,
        flat.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        ctypes.byref(n_routes))
    routes, off = [], 0
    for i in range(n_routes.value):
        routes.append(flat[off:off + lens[i]].copy())
        off += lens[i]
    return routes, float(cost)


def neural_swapstar(demands, dist, heu_dist, routes, count: int = 1000,
                    perturb_moves: int = 10):
    """LS(dist) → perturb on the learned metric → LS(dist)
    (reference neural_swapstar, cvrp_nls/aco.py:443-448)."""
    routes = swapstar(demands, dist, routes, count)
    routes = swapstar(demands, heu_dist, routes, perturb_moves)
    return swapstar(demands, dist, routes, count)


def multiple_swap_star(demands, dist, paths, count: int = 1000,
                       heu_dist=None, max_workers: int | None = None):
    """Thread fan-out over ants (reference cvrp_nls/aco.py:113-126).

    ``paths`` is ``[L, A]`` depot-delimited; returns improved ``[L, A]``."""
    paths = np.asarray(paths)
    L, A = paths.shape

    def one(a):
        routes = path_to_routes(paths[:, a])
        if heu_dist is None:
            routes = swapstar(demands, dist, routes, count)
        else:
            routes = neural_swapstar(demands, dist, heu_dist, routes, count)
        return routes_to_path(routes, L)

    with ThreadPoolExecutor(max_workers=max_workers) as ex:
        out = list(ex.map(one, range(A)))
    return np.stack(out, axis=1)
