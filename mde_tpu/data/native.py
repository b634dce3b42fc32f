"""ctypes binding + lazy build for the native augmentation engine
(native/mdeaug.cpp). Falls back to the numpy path when the toolchain is
unavailable; both paths consume the same Python-side random parameters so
results are deterministic and comparable."""

import ctypes
import os
import subprocess
import threading

import numpy as np

_REPO_ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
_SRC = os.path.join(_REPO_ROOT, "native", "mdeaug.cpp")
_BUILD_DIR = os.path.join(_REPO_ROOT, ".build")
_SO = os.path.join(_BUILD_DIR, "libmdeaug.so")

_lock = threading.Lock()
_lib = None
_tried = False


class AugParams(ctypes.Structure):
    _fields_ = [
        ("angle_deg", ctypes.c_float),
        ("crop_x", ctypes.c_int32),
        ("crop_y", ctypes.c_int32),
        ("do_flip", ctypes.c_int32),
        ("do_augment", ctypes.c_int32),
        ("gamma", ctypes.c_float),
        ("brightness", ctypes.c_float),
        ("color", ctypes.c_float * 3),
        ("depth_scale", ctypes.c_float),
    ]


class CropRect(ctypes.Structure):
    _fields_ = [("x", ctypes.c_int32), ("y", ctypes.c_int32),
                ("w", ctypes.c_int32), ("h", ctypes.c_int32)]


def _build() -> bool:
    os.makedirs(_BUILD_DIR, exist_ok=True)
    cmd = ["g++", "-O3", "-fPIC", "-shared", "-std=c++17", "-pthread",
           _SRC, "-o", _SO, "-ljpeg", "-lpng"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib():
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        lib.mdeaug_augment_batch.restype = None
        lib.mdeaug_load_augment_batch.restype = ctypes.c_int
        lib.mdeaug_version.restype = ctypes.c_int
        _lib = lib
        return _lib


def augment_batch(samples, out_h: int, out_w: int, params_list,
                  num_threads: int = 0):
    """Run the fused augmentation for a batch.

    samples: list of dicts with 'rgb' (H,W,3 u8), 'depth' (H,W u16), and
    optional 'semantics'/'instance_labels'/'instance_areas' (H,W i32) —
    all already boundary/kb-cropped.
    params_list: list of dicts matching AugParams fields.
    Returns dict of NHWC float32/int32 batch arrays (None for absent cues).
    """
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native mdeaug unavailable")
    b = len(samples)
    has_sem = "semantics" in samples[0]
    has_inst = "instance_labels" in samples[0]

    u8p = ctypes.POINTER(ctypes.c_uint8)
    u16p = ctypes.POINTER(ctypes.c_uint16)
    i32p = ctypes.POINTER(ctypes.c_int32)

    def ptr_array(key, ctype, required=True):
        arr = (ctypes.POINTER(ctype) * b)()
        holders = []
        for i, s in enumerate(samples):
            if key in s:
                a = np.ascontiguousarray(s[key])
                holders.append(a)
                arr[i] = a.ctypes.data_as(ctypes.POINTER(ctype))
            else:
                arr[i] = None
        return arr, holders

    rgb_ptrs, h1 = ptr_array("rgb", ctypes.c_uint8)
    depth_ptrs, h2 = ptr_array("depth", ctypes.c_uint16)
    sem_ptrs, h3 = ptr_array("semantics", ctypes.c_int32) if has_sem else (None, [])
    lab_ptrs, h4 = ptr_array("instance_labels", ctypes.c_int32) if has_inst else (None, [])
    area_ptrs, h5 = ptr_array("instance_areas", ctypes.c_int32) if has_inst else (None, [])

    in_hs = np.asarray([s["rgb"].shape[0] for s in samples], np.int32)
    in_ws = np.asarray([s["rgb"].shape[1] for s in samples], np.int32)

    params = (AugParams * b)()
    for i, p in enumerate(params_list):
        params[i].angle_deg = p.get("angle_deg", 0.0)
        params[i].crop_x = p["crop_x"]
        params[i].crop_y = p["crop_y"]
        params[i].do_flip = int(p.get("do_flip", False))
        params[i].do_augment = int(p.get("do_augment", False))
        params[i].gamma = p.get("gamma", 1.0)
        params[i].brightness = p.get("brightness", 1.0)
        for c in range(3):
            params[i].color[c] = p.get("color", (1.0, 1.0, 1.0))[c]
        params[i].depth_scale = p.get("depth_scale", 1e-3)

    out_img = np.empty((b, out_h, out_w, 3), np.float32)
    out_depth = np.empty((b, out_h, out_w), np.float32)
    out_sem = np.empty((b, out_h, out_w), np.int32) if has_sem else None
    out_lab = np.empty((b, out_h, out_w), np.int32) if has_inst else None
    out_area = np.empty((b, out_h, out_w), np.int32) if has_inst else None

    nt = num_threads or min(b, os.cpu_count() or 1)
    lib.mdeaug_augment_batch(
        ctypes.c_int(b), rgb_ptrs, depth_ptrs, sem_ptrs, lab_ptrs, area_ptrs,
        in_hs.ctypes.data_as(i32p), in_ws.ctypes.data_as(i32p),
        ctypes.c_int(out_h), ctypes.c_int(out_w), params,
        out_img.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out_depth.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out_sem.ctypes.data_as(i32p) if out_sem is not None else None,
        out_lab.ctypes.data_as(i32p) if out_lab is not None else None,
        out_area.ctypes.data_as(i32p) if out_area is not None else None,
        ctypes.c_int(nt))

    return {"image": out_img, "depth": out_depth[..., None],
            "semantics": out_sem[..., None] if out_sem is not None else None,
            "instance_labels": out_lab[..., None] if out_lab is not None else None,
            "instance_areas": out_area[..., None] if out_area is not None else None}


def _params_struct(b, params_list):
    params = (AugParams * b)()
    for i, p in enumerate(params_list):
        params[i].angle_deg = p.get("angle_deg", 0.0)
        params[i].crop_x = p["crop_x"]
        params[i].crop_y = p["crop_y"]
        params[i].do_flip = int(p.get("do_flip", False))
        params[i].do_augment = int(p.get("do_augment", False))
        params[i].gamma = p.get("gamma", 1.0)
        params[i].brightness = p.get("brightness", 1.0)
        for c in range(3):
            params[i].color[c] = p.get("color", (1.0, 1.0, 1.0))[c]
        params[i].depth_scale = p.get("depth_scale", 1e-3)
    return params


def load_augment_batch(rgb_paths, depth_paths, cue_maps, rects, out_h: int,
                       out_w: int, params_list, num_threads: int = 0):
    """Fully-native batch: file read + JPEG/PNG decode + pre-crop + augment
    in C++ threads (mdeaug_load_augment_batch). cue_maps is a list of dicts
    (full-frame int32 arrays, or empty dicts); rects is a list of
    (x, y, w, h) pre-crop windows or None for full frame.

    Returns (batch dict, n_failures)."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native mdeaug unavailable")
    b = len(rgb_paths)
    has_sem = any("semantics" in c for c in cue_maps)
    has_inst = any("instance_labels" in c for c in cue_maps)

    i32p = ctypes.POINTER(ctypes.c_int32)

    def cue_ptrs(key):
        arr = (i32p * b)()
        holders = []
        for i, c in enumerate(cue_maps):
            if key in c:
                a = np.ascontiguousarray(c[key], dtype=np.int32)
                holders.append(a)
                arr[i] = a.ctypes.data_as(i32p)
            else:
                arr[i] = None
        return arr, holders

    sem_ptrs, h1 = cue_ptrs("semantics") if has_sem else (None, [])
    lab_ptrs, h2 = cue_ptrs("instance_labels") if has_inst else (None, [])
    area_ptrs, h3 = cue_ptrs("instance_areas") if has_inst else (None, [])

    rgb_arr = (ctypes.c_char_p * b)(*[p.encode() for p in rgb_paths])
    depth_arr = (ctypes.c_char_p * b)(*[p.encode() for p in depth_paths])

    crects = (CropRect * b)()
    for i, r in enumerate(rects):
        if r is None:
            crects[i] = CropRect(0, 0, -1, -1)
        else:
            crects[i] = CropRect(*[int(v) for v in r])

    params = _params_struct(b, params_list)

    out_img = np.empty((b, out_h, out_w, 3), np.float32)
    out_depth = np.empty((b, out_h, out_w), np.float32)
    out_sem = np.empty((b, out_h, out_w), np.int32) if has_sem else None
    out_lab = np.empty((b, out_h, out_w), np.int32) if has_inst else None
    out_area = np.empty((b, out_h, out_w), np.int32) if has_inst else None

    nt = num_threads or min(b, os.cpu_count() or 1)
    nfail = lib.mdeaug_load_augment_batch(
        ctypes.c_int(b), rgb_arr, depth_arr, sem_ptrs, lab_ptrs, area_ptrs,
        crects, ctypes.c_int(out_h), ctypes.c_int(out_w), params,
        out_img.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out_depth.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out_sem.ctypes.data_as(i32p) if out_sem is not None else None,
        out_lab.ctypes.data_as(i32p) if out_lab is not None else None,
        out_area.ctypes.data_as(i32p) if out_area is not None else None,
        ctypes.c_int(nt))

    batch = {"image": out_img, "depth": out_depth[..., None],
             "semantics": out_sem[..., None] if out_sem is not None else None,
             "instance_labels": out_lab[..., None] if out_lab is not None else None,
             "instance_areas": out_area[..., None] if out_area is not None else None}
    return batch, int(nfail)
