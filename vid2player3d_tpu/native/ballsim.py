"""ctypes binding for the native ball-flight simulator (native/ballsim.cpp).

Replaces the reference's offline Isaac Gym trajectory farm
(`vid2player/utils/tennis_ball.py:221-356`) for host-side pool/table
generation: a C++/OpenMP kernel with the exact force model of
`tennis/ball.py:simulate_flight`, so pools built here match on-device
re-simulation up to float accumulation order.

The library is compiled on first use (g++, cached next to the source with an
mtime check) — no pip/pybind11 involved. If no toolchain is available,
`native_available()` is False and callers fall back to the JAX integrator.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import NamedTuple, Optional

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "native", "ballsim.cpp")
_LIB = os.path.join(_REPO_ROOT, "native", "build", "libballsim.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_error: Optional[str] = None


class _CParams(ctypes.Structure):
    _fields_ = [(f, ctypes.c_float) for f in
                ("mass", "radius", "rho", "gravity", "base_cd",
                 "restitution", "friction", "spin_scale", "net_height")]


def build_library(force: bool = False) -> str:
    """Compile native/ballsim.cpp -> libballsim.so (cached by mtime)."""
    os.makedirs(os.path.dirname(_LIB), exist_ok=True)
    if (not force and os.path.exists(_LIB)
            and os.path.getmtime(_LIB) >= os.path.getmtime(_SRC)):
        return _LIB
    cmd = ["g++", "-O3", "-fopenmp", "-shared", "-fPIC", "-std=c++17",
           _SRC, "-o", _LIB]
    subprocess.run(cmd, check=True, capture_output=True, text=True)
    return _LIB


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_error
    with _lock:
        if _lib is not None or _build_error is not None:
            return _lib
        try:
            lib = ctypes.CDLL(build_library())
        except (OSError, subprocess.CalledProcessError) as e:
            _build_error = str(e)
            return None
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
        lib.ballsim_simulate.argtypes = [
            f32p, f32p, f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(_CParams), f32p, f32p, f32p, f32p, f32p, f32p,
            f32p, u8p, u8p]
        lib.ballsim_simulate.restype = None
        lib.ballsim_version.restype = ctypes.c_int
        _lib = lib
        return _lib


def native_available() -> bool:
    return _load() is not None


class NativeFlightResult(NamedTuple):
    """Mirrors tennis/ball.py FlightResult, as host numpy arrays."""
    traj: np.ndarray
    bounce_pos: np.ndarray
    bounce_time: np.ndarray
    has_bounce: np.ndarray
    pass_net: np.ndarray
    max_height_after_bounce: np.ndarray
    final_pos: np.ndarray
    final_vel: np.ndarray
    final_vspin: np.ndarray


def simulate_flight_native(pos0, vel0, vspin0, num_frames: int = 100,
                           substeps: int = 4,
                           params=None) -> NativeFlightResult:
    """Batched flight integration on the host CPU (OpenMP over balls)."""
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native ballsim unavailable: {_build_error}")
    from ..tennis import court
    from ..tennis.ball import DEFAULT_PARAMS

    p = params or DEFAULT_PARAMS
    cp = _CParams(mass=p.mass, radius=p.radius, rho=p.rho, gravity=p.gravity,
                  base_cd=p.base_cd, restitution=p.restitution,
                  friction=p.friction, spin_scale=p.spin_scale,
                  net_height=court.NET_HEIGHT)

    pos0 = np.ascontiguousarray(pos0, np.float32)
    vel0 = np.ascontiguousarray(vel0, np.float32)
    vspin0 = np.ascontiguousarray(vspin0, np.float32)
    n = pos0.shape[0]
    traj = np.empty((n, num_frames, 3), np.float32)
    bounce_pos = np.empty((n, 3), np.float32)
    bounce_time = np.empty(n, np.float32)
    max_h = np.empty(n, np.float32)
    final_pos = np.empty((n, 3), np.float32)
    final_vel = np.empty((n, 3), np.float32)
    final_vspin = np.empty(n, np.float32)
    has_bounce = np.empty(n, np.uint8)
    pass_net = np.empty(n, np.uint8)

    lib.ballsim_simulate(pos0, vel0, vspin0, n, num_frames, substeps,
                         ctypes.byref(cp), traj, bounce_pos, bounce_time,
                         max_h, final_pos, final_vel, final_vspin,
                         has_bounce, pass_net)
    return NativeFlightResult(
        traj=traj, bounce_pos=bounce_pos, bounce_time=bounce_time,
        has_bounce=has_bounce.astype(bool), pass_net=pass_net.astype(bool),
        max_height_after_bounce=max_h, final_pos=final_pos,
        final_vel=final_vel, final_vspin=final_vspin)
