"""
Native (C++) host-runtime components, bound via ctypes.

The compute path of the framework is JAX/XLA on the TPU; the host runtime
around it — audio decode, header validation, resampling — is native C++
(lidbox_tpu/native/audioio.cpp). ctypes calls drop the GIL, so a Python
thread pool decoding through this library runs truly in parallel, which is
what keeps the host loader ahead of the device (SURVEY.md §7 "host loader
throughput" hard part).

The library is built on demand with g++ (cached next to the source); every
entry point has a pure-Python fallback in lidbox_tpu.features.io, selected
automatically when no compiler is available or LIDBOX_NO_NATIVE is set.
"""
import ctypes
import os
import subprocess
import threading

import numpy as np

from lidbox_tpu import get_logger

logger = get_logger("native")

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "audioio.cpp")
_LIB = os.path.join(_HERE, "libaudioio.so")

_lib = None
_lock = threading.Lock()
_build_failed = False


def _build():
    cmd = ["g++", "-O3", "-march=native", "-funroll-loops", "-shared",
           "-fPIC", "-std=c++17", _SRC, "-o", _LIB]
    logger.info("Building native audio library: %s", " ".join(cmd))
    subprocess.run(cmd, check=True, capture_output=True, text=True)


def load_library():
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    if os.environ.get("LIDBOX_NO_NATIVE"):
        _build_failed = True
        return None
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        try:
            src_mtime = os.path.getmtime(_SRC)
            if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < src_mtime:
                _build()
            lib = ctypes.CDLL(_LIB)
        except (OSError, subprocess.CalledProcessError) as e:
            logger.warning("native audio library unavailable (%s); "
                           "using pure-Python IO", e)
            _build_failed = True
            return None
        lib.la_read_wav.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ctypes.POINTER(ctypes.c_long), ctypes.POINTER(ctypes.c_int)]
        lib.la_read_wav.restype = ctypes.c_int
        lib.la_read_wav_into.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_long,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_long)]
        lib.la_read_wav_into.restype = ctypes.c_long
        lib.la_wav_header_is_valid.argtypes = [ctypes.c_char_p]
        lib.la_wav_header_is_valid.restype = ctypes.c_int
        lib.la_resample_linear.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_long, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.POINTER(ctypes.c_float))]
        lib.la_resample_linear.restype = ctypes.c_long
        lib.la_rms_frames.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_long, ctypes.c_long,
            ctypes.POINTER(ctypes.c_float)]
        lib.la_rms_frames.restype = ctypes.c_long
        lib.la_read_mp3.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ctypes.POINTER(ctypes.c_long), ctypes.POINTER(ctypes.c_int)]
        lib.la_read_mp3.restype = ctypes.c_int
        lib.la_mp3_supported.argtypes = []
        lib.la_mp3_supported.restype = ctypes.c_int
        lib.la_mp3_info.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_long),
            ctypes.POINTER(ctypes.c_int)]
        lib.la_mp3_info.restype = ctypes.c_int
        lib.la_free.argtypes = [ctypes.c_void_p]
        lib.la_free.restype = None
        _lib = lib
        logger.info("Loaded native audio library %s", _LIB)
    return _lib


def available():
    return load_library() is not None


def read_wav(path):
    """Decode a wav to (mono float32, sample_rate) natively; raises on
    failure (callers fall back to the Python decoder)."""
    lib = load_library()
    if lib is None:
        raise RuntimeError("native library unavailable")
    out = ctypes.POINTER(ctypes.c_float)()
    n = ctypes.c_long()
    rate = ctypes.c_int()
    err = lib.la_read_wav(str(path).encode(), ctypes.byref(out),
                          ctypes.byref(n), ctypes.byref(rate))
    if err != 0:
        raise ValueError(f"native wav decode failed ({err}) for {path}")
    try:
        data = np.ctypeslib.as_array(out, shape=(n.value,)).copy()
    finally:
        lib.la_free(out)
    return data, rate.value


def mp3_supported():
    """True when the native mp3 decoder (system libmpg123) is usable."""
    lib = load_library()
    return lib is not None and bool(lib.la_mp3_supported())


def read_mp3(path):
    """Decode an mp3 to (mono float32, sample_rate) via the system
    libmpg123 (channel-mean mono, like the reference's read_mp3,
    lidbox/features/audio.py:26-34); raises on failure."""
    lib = load_library()
    if lib is None:
        raise RuntimeError("native library unavailable")
    out = ctypes.POINTER(ctypes.c_float)()
    n = ctypes.c_long()
    rate = ctypes.c_int()
    err = lib.la_read_mp3(str(path).encode(), ctypes.byref(out),
                          ctypes.byref(n), ctypes.byref(rate))
    if err != 0:
        raise ValueError(f"native mp3 decode failed ({err}) for {path}")
    try:
        data = np.ctypeslib.as_array(out, shape=(n.value,)).copy()
    finally:
        lib.la_free(out)
    return data, rate.value


def mp3_info(path):
    """(sample_count, sample_rate) of an mp3 via an mpg123 frame scan —
    no decode (duration back-end for metadata preparation,
    reference analogue: miniaudio.get_file_info in lidbox/meta/utils.py:53-67)."""
    lib = load_library()
    if lib is None:
        raise RuntimeError("native library unavailable")
    n = ctypes.c_long()
    rate = ctypes.c_int()
    err = lib.la_mp3_info(str(path).encode(), ctypes.byref(n),
                          ctypes.byref(rate))
    if err != 0:
        raise ValueError(f"native mp3 scan failed ({err}) for {path}")
    return n.value, rate.value


def wav_header_is_valid(path):
    lib = load_library()
    if lib is None:
        raise RuntimeError("native library unavailable")
    return bool(lib.la_wav_header_is_valid(str(path).encode()))


def resample_linear(signal, in_rate, out_rate):
    lib = load_library()
    if lib is None:
        raise RuntimeError("native library unavailable")
    signal = np.ascontiguousarray(signal, np.float32)
    out = ctypes.POINTER(ctypes.c_float)()
    m = lib.la_resample_linear(
        signal.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        len(signal), int(in_rate), int(out_rate), ctypes.byref(out))
    if m < 0:
        raise ValueError(f"native resample failed ({m})")
    try:
        data = np.ctypeslib.as_array(out, shape=(m,)).copy()
    finally:
        lib.la_free(out)
    return data


def rms_frames(signal, step):
    lib = load_library()
    if lib is None:
        raise RuntimeError("native library unavailable")
    signal = np.ascontiguousarray(signal, np.float32)
    out = np.empty(len(signal) // step, np.float32)
    n = lib.la_rms_frames(
        signal.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        len(signal), int(step),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    if n < 0:
        raise ValueError("native rms failed")
    return out[:n]
