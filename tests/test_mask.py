"""Native RLE mask library tests: roundtrips + parity vs. the reference's
maskApi.c compiled directly as a ctypes oracle (run, not copied)."""

import ctypes as C
import os
import subprocess

import numpy as np
import pytest

from adaptive_tpu.native import mask as M

REF_SRC = "/root/reference/coco/common/maskApi.c"


# ------------------------------------------------------------- self-checks
def _random_mask(rng, h, w, blobs=3):
    m = np.zeros((h, w), np.uint8)
    for _ in range(blobs):
        y, x = rng.integers(0, h), rng.integers(0, w)
        hh, ww = rng.integers(1, h // 2 + 1), rng.integers(1, w // 2 + 1)
        m[y : y + hh, x : x + ww] = 1
    return m


def test_encode_decode_roundtrip():
    rng = np.random.default_rng(0)
    for _ in range(10):
        m = _random_mask(rng, 37, 23)
        rle = M.encode(m)
        out = M.decode(rle)
        np.testing.assert_array_equal(out, m)


def test_area_and_bbox():
    m = np.zeros((10, 12), np.uint8)
    m[2:5, 3:8] = 1
    rle = M.encode(m)
    assert M.area(rle) == 15
    np.testing.assert_array_equal(M.toBbox(rle), [3, 2, 5, 3])  # x,y,w,h


def test_merge_union_intersection():
    a = np.zeros((8, 8), np.uint8)
    b = np.zeros((8, 8), np.uint8)
    a[0:4] = 1
    b[2:6] = 1
    u = M.decode(M.merge([M.encode(a), M.encode(b)], intersect=False))
    i = M.decode(M.merge([M.encode(a), M.encode(b)], intersect=True))
    np.testing.assert_array_equal(u, (a | b))
    np.testing.assert_array_equal(i, (a & b))


def test_iou_rle_and_bbox():
    a = np.zeros((10, 10), np.uint8)
    b = np.zeros((10, 10), np.uint8)
    a[0:5] = 1  # 50 px
    b[3:8] = 1  # 50 px, overlap 20
    got = M.iou([M.encode(a)], [M.encode(b)], [0])
    assert got.shape == (1, 1)
    assert abs(got[0, 0] - 20 / 80) < 1e-9
    # crowd: union = dt area
    got_crowd = M.iou([M.encode(a)], [M.encode(b)], [1])
    assert abs(got_crowd[0, 0] - 20 / 50) < 1e-9
    # bbox mode: [x,y,w,h]
    bb = M.iou([[0, 0, 4, 4]], [[2, 2, 4, 4]], [0])
    assert abs(bb[0, 0] - 4 / 28) < 1e-9


def test_frPyObjects_polygon_and_bbox():
    sq = [1.0, 1.0, 1.0, 6.0, 6.0, 6.0, 6.0, 1.0]  # square polygon
    rle = M.frPyObjects([sq], 10, 10)[0]
    m = M.decode(rle)
    assert 16 <= m.sum() <= 36  # ~5x5 square
    bb = M.frPyObjects([[2, 3, 4, 5]], 10, 10)[0]
    np.testing.assert_array_equal(M.toBbox(bb), [2, 3, 4, 5])


# ----------------------------------------------------- parity vs maskApi.c
class _RefRLE(C.Structure):
    _fields_ = [("h", C.c_ulong), ("w", C.c_ulong), ("m", C.c_ulong),
                ("cnts", C.POINTER(C.c_uint))]


@pytest.fixture(scope="module")
def ref(tmp_path_factory):
    if not os.path.exists(REF_SRC):
        pytest.skip("reference maskApi.c unavailable")
    d = tmp_path_factory.mktemp("refmask")
    lib_path = str(d / "refmask.so")
    subprocess.run(
        ["gcc", "-O2", "-shared", "-fPIC", REF_SRC, f"-I{os.path.dirname(REF_SRC)}",
         "-o", lib_path],
        check=True, capture_output=True,
    )
    lib = C.CDLL(lib_path)
    lib.rleEncode.argtypes = [C.POINTER(_RefRLE), C.POINTER(C.c_ubyte),
                              C.c_ulong, C.c_ulong, C.c_ulong]
    lib.rleArea.argtypes = [C.POINTER(_RefRLE), C.c_ulong, C.POINTER(C.c_uint)]
    lib.rleToBbox.argtypes = [C.POINTER(_RefRLE), C.POINTER(C.c_double), C.c_ulong]
    lib.rleToString.restype = C.c_char_p
    lib.rleToString.argtypes = [C.POINTER(_RefRLE)]
    lib.rleIou.argtypes = [C.POINTER(_RefRLE), C.POINTER(_RefRLE), C.c_ulong,
                           C.c_ulong, C.POINTER(C.c_ubyte), C.POINTER(C.c_double)]
    lib.rleFrPoly.argtypes = [C.POINTER(_RefRLE), C.POINTER(C.c_double),
                              C.c_ulong, C.c_ulong, C.c_ulong]
    return lib


def _ref_encode(lib, m):
    h, w = m.shape
    flat = np.asfortranarray(m).ravel(order="F").copy()
    r = _RefRLE()
    lib.rleEncode(C.byref(r), flat.ctypes.data_as(C.POINTER(C.c_ubyte)), h, w, 1)
    return r


def test_string_codec_parity_with_reference(ref):
    rng = np.random.default_rng(1)
    for _ in range(10):
        m = _random_mask(rng, 29, 31)
        r = _ref_encode(ref, m)
        want = ref.rleToString(C.byref(r))
        got = M.encode(m)["counts"]
        assert got == want


def test_area_bbox_parity_with_reference(ref):
    rng = np.random.default_rng(2)
    for _ in range(10):
        m = _random_mask(rng, 21, 33)
        r = _ref_encode(ref, m)
        a = (C.c_uint * 1)()
        ref.rleArea(C.byref(r), 1, a)
        bb = (C.c_double * 4)()
        ref.rleToBbox(C.byref(r), bb, 1)
        assert M.area(M.encode(m)) == a[0]
        np.testing.assert_allclose(M.toBbox(M.encode(m)), list(bb))


def test_iou_parity_with_reference(ref):
    rng = np.random.default_rng(3)
    masks = [_random_mask(rng, 19, 17) for _ in range(4)]
    dts, gts = masks[:2], masks[2:]
    r_dt = (_RefRLE * 2)(*[_ref_encode(ref, m) for m in dts])
    r_gt = (_RefRLE * 2)(*[_ref_encode(ref, m) for m in gts])
    crowd = (C.c_ubyte * 2)(0, 0)
    out = (C.c_double * 4)()
    ref.rleIou(r_dt, r_gt, 2, 2, crowd, out)
    # maskApi.c stores o[g*m+d] (column-major); pycocotools reshapes with
    # order='F' — decode the oracle the same way
    want = np.array(list(out)).reshape(2, 2, order="F")
    got = M.iou([M.encode(m) for m in dts], [M.encode(m) for m in gts], [0, 0])
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_frpoly_close_to_reference(ref):
    # polygon rasterization conventions may differ by boundary subpixels;
    # require high IoU between the two fills rather than exact equality
    poly = np.array([2.0, 2.0, 2.0, 14.0, 14.0, 14.0, 14.0, 2.0])
    r = _RefRLE()
    ref.rleFrPoly(C.byref(r), poly.ctypes.data_as(C.POINTER(C.c_double)), 4, 20, 20)
    want_str = ref.rleToString(C.byref(r))
    want = M.decode({"size": [20, 20], "counts": want_str})
    got = M.decode(M.frPyObjects([poly.tolist()], 20, 20)[0])
    inter = int((want & got).sum())
    union = int((want | got).sum())
    assert union > 0 and inter / union > 0.9, (inter, union)


def test_decode_bounded_on_corrupt_counts():
    """A crafted RLE whose runs sum past h*w must not write past the buffer
    (the vendored maskApi.c trusts the counts; we clamp at h*w)."""
    from adaptive_tpu.native import mask as M

    good = M.encode(np.ones((4, 4), np.uint8))
    # corrupt: claim a tiny mask but keep the 16-pixel counts string
    bad = {"size": [2, 2], "counts": good["counts"]}
    out = M.decode(bad)
    assert out.shape == (2, 2)  # no crash, no overflow
    # well-formed RLEs are unaffected
    np.testing.assert_array_equal(M.decode(good), np.ones((4, 4), np.uint8))
