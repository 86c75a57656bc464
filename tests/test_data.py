"""Data-layer parity: dffx loaders vs the reference loaders (imported read-only
as oracles) on the bundled real scene and on synthetic fixtures (SURVEY.md §4:
loader golden tests on tiny fixture files)."""

import os
import sys
import types

import numpy as np
import pytest

from dffx.data import exr
from dffx.data import augmentation as aug
from dffx.data.datasets import (
    DDFFBenchmark,
    DefocusNetDataset,
    HCIDataset,
    MiddleburyDataset,
    RealScenesDataset,
    SmartphoneDataset,
)
from dffx.data.pipeline import Loader

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF), reason="no reference")


def _ref_loader_mod(subdir, name):
    import importlib

    from conftest import install_reference_stubs

    install_reference_stubs()
    path = os.path.join(REF, subdir)
    if path not in sys.path:
        sys.path.insert(0, path)
    return importlib.import_module(name)


# ---------------------------------------------------------------------------
# Real scene (the only data shipped in-repo): direct parity on `balls/`
# ---------------------------------------------------------------------------


def test_real_scenes_parity_on_bundled_balls(monkeypatch):
    scenes_root = os.path.join(REF, "End_to_End", "Datasets")
    ours = RealScenesDataset(root=scenes_root)[0]

    mod = _ref_loader_mod("End_to_End", "Test_dataloader")
    monkeypatch.chdir(os.path.join(REF, "End_to_End"))
    ref_fs, ref_fd, ref_fov, ref_shape = mod.Real_Scenes()[0]

    ref_fs = np.asarray(ref_fs)  # (3, N, Hp, Wp)
    np.testing.assert_allclose(ours["fs"], ref_fs.transpose(1, 2, 3, 0), atol=1e-6)
    np.testing.assert_allclose(ours["focus_dists"], np.asarray(ref_fd).squeeze(), atol=1e-7)
    np.testing.assert_allclose(ours["fovs"], np.asarray(ref_fov).squeeze(), rtol=1e-6)
    assert tuple(ours["unpadded"]) == tuple(ref_shape[:2])
    assert ours["fs"].shape[1] % 32 == 0 and ours["fs"].shape[2] % 32 == 0


# ---------------------------------------------------------------------------
# Augmentation math parity (pure functions, explicit seeds)
# ---------------------------------------------------------------------------


def test_augmentation_parity(rng):
    ref_aug = _ref_loader_mod("train_codes", "augmentation")
    x = rng.uniform(0, 255, (16, 18, 3, 5))
    d = rng.uniform(0, 2, (16, 18))
    got = aug.image_augmentation(x, 1.3, -0.05, 1.7)
    want = ref_aug.image_augmentation(x, 1.3, -0.05, 1.7)
    np.testing.assert_allclose(got, want, rtol=1e-12)

    # the uint8 LUT fast path must be BIT-identical to casting first and
    # running the float32 chain (it is the same float32 ops per value)
    xu = rng.integers(0, 256, (16, 18, 3, 5), dtype=np.uint8)
    fast = aug.image_augmentation(xu, 1.3, -0.05, 1.7)
    slow = aug.image_augmentation(xu.astype(np.float32), 1.3, -0.05, 1.7)
    assert fast.dtype == np.float32
    np.testing.assert_array_equal(fast, slow)
    # float64 LUT == the reference's uint8→float64 numpy-promotion chain
    fast64 = aug.image_augmentation(xu, 1.3, -0.05, 1.7, lut_dtype=np.float64)
    want64 = ref_aug.image_augmentation(xu, 1.3, -0.05, 1.7)
    assert fast64.dtype == np.float64 and want64.dtype == np.float64
    np.testing.assert_array_equal(fast64, want64)

    for rv in (0.2, 0.9):
        gx, gd = aug.horizontal_flip(x.copy(), d.copy(), rv)
        wx, wd = ref_aug.horizontal_flip(x.copy(), d.copy(), rv)
        np.testing.assert_array_equal(gx, wx)
        np.testing.assert_array_equal(gd, wd)
        gx, gd = aug.vertical_flip(x.copy(), d.copy(), rv)
        wx, wd = ref_aug.vertical_flip(x.copy(), d.copy(), rv)
        np.testing.assert_array_equal(gx, wx)
    for k in range(4):
        gx, gd = aug.rotate(x.copy(), d.copy(), k)
        wx, wd = ref_aug.rotate(x.copy(), d.copy(), k)
        np.testing.assert_array_equal(gx, wx)
        np.testing.assert_array_equal(gd, wd)
    gx, gd = aug.randcrop_3d(x, d, 3, 2, 6, 4)
    wx, wd = ref_aug.randcrop_3d(x, d, 3, 2, 6, 4)
    np.testing.assert_array_equal(gx, wx)
    np.testing.assert_array_equal(gd, wd)


# ---------------------------------------------------------------------------
# Fixture-based loader parity
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def fs6_dir(tmp_path_factory):
    import cv2

    root = tmp_path_factory.mktemp("fs6") / "test"
    root.mkdir()
    r = np.random.default_rng(3)
    for s in range(2):
        depth = r.uniform(0.0, 1.8, (256, 256)).astype(np.float16)
        exr.write(str(root / f"{s:02d}Dpt.exr"), {"R": depth, "G": depth, "B": depth})
        for i in range(5):
            img = r.integers(0, 256, (256, 256, 3), dtype=np.uint8)
            cv2.imwrite(str(root / f"{s:02d}_{i}All.tif"), img)
    return str(root.parent)


def test_fs6_parity(fs6_dir, monkeypatch):
    ours = DefocusNetDataset(root=fs6_dir, mode="test")
    assert len(ours) == 2
    mod = _ref_loader_mod("Depth_Estimation_Test", "test_Dataloader")
    monkeypatch.chdir(fs6_dir)
    monkeypatch.setattr(mod.FS6_dataset, "__init__", _fs6_init(fs6_dir))
    ref = mod.FS6_dataset()
    for i in range(2):
        o = ours[i]
        r_fs, r_gt, r_fd, r_mask = ref[i]
        np.testing.assert_allclose(o["fs"], np.asarray(r_fs).transpose(1, 2, 3, 0), atol=1e-6)
        np.testing.assert_allclose(o["depth"], np.asarray(r_gt), atol=0)
        np.testing.assert_array_equal(o["mask"], np.asarray(r_mask))
        np.testing.assert_allclose(o["focus_dists"], np.asarray(r_fd)[:, 0, 0])


def _fs6_init(root):
    from os import listdir
    from os.path import isfile, join

    import torch

    def __init__(self):
        self.root = root + "/test/"
        fls = [f for f in listdir(self.root) if isfile(join(self.root, f))]
        self.imglist_all = sorted(f for f in fls if f[-7:] == "All.tif")
        self.imglist_dpt = sorted(f for f in fls if f[-7:] == "Dpt.exr")
        self.max_depth = 3.0
        fd = np.array([0.1, 0.15, 0.3, 0.7, 1.5])[:, None, None].astype(np.float32)
        self.Focus_Dists = torch.Tensor(np.tile(fd, [1, 256, 256]))

    return __init__


@pytest.fixture(scope="module")
def ddff_test_h5(tmp_path_factory):
    import h5py

    path = tmp_path_factory.mktemp("ddff") / "ddff-test.h5"
    r = np.random.default_rng(4)
    with h5py.File(path, "w") as f:
        f["stack_test"] = r.integers(0, 256, (2, 10, 47, 72, 3), dtype=np.uint8)
    return str(path)


def test_ddff_benchmark_parity(ddff_test_h5):
    ours = DDFFBenchmark(h5_path=ddff_test_h5)
    mod = _ref_loader_mod("Depth_Estimation_Test", "test_Dataloader")
    ref = mod.DDFF12dataset_benchmark.__new__(mod.DDFF12dataset_benchmark)
    import h5py
    import torch

    ref.hdf5 = h5py.File(ddff_test_h5, "r")
    ref.stack_key = "stack_test"
    ref.focus_dists = torch.Tensor(ours.focus_dists)
    for i in range(2):
        o = ours[i]
        r_fs = np.asarray(mod.DDFF12dataset_benchmark.__getitem__(ref, i)[0])
        np.testing.assert_allclose(o["fs"], r_fs.transpose(1, 2, 3, 0), atol=1e-6)
        assert o["fs"].shape[1] % 32 == 0 and o["fs"].shape[2] % 32 == 0
        assert tuple(o["unpadded"]) == (47, 72)
    np.testing.assert_allclose(
        ours.focus_dists,
        np.linspace(1982.0250823695178 / 7317.020641763665 * 1e-3 * 521.4052 / 0.5,
                    1982.0250823695178 / 7317.020641763665 * 1e-3 * 521.4052 / 7, 10),
        rtol=1e-6,
    )


@pytest.fixture(scope="module")
def hci_h5(tmp_path_factory):
    import h5py

    path = tmp_path_factory.mktemp("hci") / "hci.h5"
    r = np.random.default_rng(5)
    with h5py.File(path, "w") as f:
        f["stack_val"] = r.integers(0, 256, (1, 10, 512, 512, 3), dtype=np.uint8)
        f["disp_val"] = r.uniform(-3.2, 3.2, (1, 512, 512)).astype(np.float32)
        f["focus_position_disp"] = np.linspace(-2.5, 2.5, 10)[None].astype(np.float32)
    return str(path)


def test_hci_val_parity(hci_h5):
    ours = HCIDataset(h5_path=hci_h5, split="val")
    mod = _ref_loader_mod("Depth_Estimation_Test", "test_Dataloader")
    import h5py
    import torch

    ref = mod.HCI_dataset.__new__(mod.HCI_dataset)
    ref.hdf5 = h5py.File(hci_h5, "r")
    ref.stack_key, ref.disp_key = "stack_val", "disp_val"
    ref.input_size = ref.size = (512, 512)
    fd = np.squeeze(np.asarray(ref.hdf5["focus_position_disp"]), axis=0)[:, None, None]
    ref.focus_dists = torch.Tensor(np.tile(fd, [1, 512, 512]))
    ref.min_dist, ref.max_dist = np.min(fd), np.max(fd)

    o = ours[0]
    r_fs, r_gt, r_fd, r_mask = mod.HCI_dataset.__getitem__(ref, 0)
    np.testing.assert_allclose(o["fs"], np.asarray(r_fs).transpose(1, 2, 3, 0), atol=1e-6)
    np.testing.assert_allclose(o["depth"], np.asarray(r_gt))
    np.testing.assert_array_equal(o["mask"], np.asarray(r_mask))


def test_ddff_trainval_crop_makes_rot90_batches_collatable(tmp_path):
    """The reference's rot90 augmentation swaps H/W per sample, so its batch-4
    DataLoader crashes in collate on non-square DDFF stacks
    (`train_codes/train_Dataloader.py:59-73` — note the dead H,W=(224,224)
    line; `train_code_DDFF.py:69`).  The in-loader crop fixes it."""
    import h5py

    from dffx.data import DDFFTrainval, Loader

    path = str(tmp_path / "ddff-trainval.h5")
    r = np.random.default_rng(7)
    with h5py.File(path, "w") as f:
        # non-square, like the real 383x552 stacks (scaled down)
        f["stack_train"] = r.integers(0, 256, (8, 10, 48, 72, 3), dtype=np.uint8)
        f["disp_train"] = r.uniform(0.02, 0.28, (8, 48, 72)).astype(np.float32)

    ds = DDFFTrainval(h5_path=path, split="train", seed=0, crop=(32, 32))
    seen_rot = False
    for i in range(8):
        s = ds[i]
        assert s["fs"].shape == (10, 32, 32, 3)
        assert s["depth"].shape == (32, 32)
    # the crop must not have disabled the rot90 aug: different seeds still
    # produce different orientations pre-crop (observable via full-frame mode)
    full = DDFFTrainval(h5_path=path, split="train", seed=0, crop=None)
    shapes = {full[i]["depth"].shape for i in range(8)}
    seen_rot = len(shapes) > 1
    assert seen_rot, shapes

    # batch > 1 must collate (this is exactly where the reference crashes)
    loader = Loader(ds, batch_size=4, shuffle=True, drop_last=True, num_threads=2)
    batches = list(loader)
    assert all(b["fs"].shape == (4, 10, 32, 32, 3) for b in batches)


@pytest.fixture(scope="module")
def smartphone_dir(tmp_path_factory):
    import cv2

    root = tmp_path_factory.mktemp("phone")
    r = np.random.default_rng(6)
    indexes = np.rint(np.linspace(0, 48, 10, endpoint=True)).astype(int)
    scene = root / "test"
    for sub in ["scaled_images/scene0", "merged_depth/scene0", "merged_conf/scene0"]:
        (scene / sub).mkdir(parents=True)
    for j in indexes:
        (scene / f"scaled_images/scene0/{j}").mkdir()
        img = r.integers(0, 256, (504, 378, 3), dtype=np.uint8)
        cv2.imwrite(str(scene / f"scaled_images/scene0/{j}/result_scaled_image_center.jpg"), img)
    depth_png = r.integers(0, 256, (504, 378), dtype=np.uint8)
    cv2.imwrite(str(scene / "merged_depth/scene0/result_merged_depth_center.png"), depth_png)
    conf = r.uniform(0, 1.4, (504, 378)).astype(np.float16)
    exr.write(
        str(scene / "merged_conf/scene0/result_merged_conf_center.exr"),
        {"R": conf, "G": conf, "B": conf},
    )
    return str(root) + "/"


def test_smartphone_test_loader(smartphone_dir):
    ds = SmartphoneDataset(root=smartphone_dir, mode="test")
    assert len(ds) == 1
    o = ds[0]
    assert o["fs"].shape == (10, 352, 256, 3)  # 336x252 padded to x32
    assert o["depth"].shape == (336, 252)
    assert o["conf"].max() <= 1.0
    # padding value is -1 in test mode
    assert np.all(o["fs"][:, 336:, :, :] == -1.0)
    # focus distances: diopters of the table subsampled at rint(linspace)
    expect_m = np.asarray([3910.92, 935.91, 546.23, 407.40, 329.95, 274.13,
                           237.08, 207.10, 183.96, 165.57]) * 1e-3
    idx = np.rint(np.linspace(0, 48, 10)).astype(int)
    table = np.asarray(
        [3910.92, 2289.27, 1508.71, 1185.83, 935.91, 801.09, 700.37, 605.39,
         546.23, 486.87, 447.99, 407.40, 379.91, 350.41, 329.95, 307.54,
         291.72, 274.13, 261.53, 247.35, 237.08, 225.41, 216.88, 207.10,
         198.18, 191.60, 183.96, 178.29, 171.69, 165.57, 160.99, 155.61,
         150.59, 146.81, 142.35, 138.98, 134.99, 131.23, 127.69, 124.99,
         121.77, 118.73, 116.40, 113.63, 110.99, 108.47, 106.54, 104.23, 102.01]
    )
    np.testing.assert_allclose(o["focus_dists"], 1.0 / (table[idx] * 1e-3), rtol=1e-6)
    # GT decode: g/255 -> 20/(100-99.8g) -> 1/x, clamped outside [min,max] -> 0
    assert set(np.unique(o["mask"])) <= {False, True}


@pytest.fixture(scope="module")
def middlebury_fixture(tmp_path_factory):
    import cv2

    root = tmp_path_factory.mktemp("midd")
    r = np.random.default_rng(7)
    lines = []
    for s in range(1):
        paths = []
        for i in range(15):
            p = root / f"s{s}_im{i}.png"
            cv2.imwrite(str(p), r.integers(0, 256, (40, 56, 3), dtype=np.uint8))
            paths.append(str(p))
        dp = root / f"s{s}_disp.png"
        cv2.imwrite(str(dp), r.integers(0, 80, (40, 56), dtype=np.uint8).astype(np.uint8))
        lines.append(" ".join(paths + [str(dp)]))
    lst = root / "list.txt"
    lst.write_text("\n".join(lines) + "\n")
    return str(lst)


def test_middlebury_loader(middlebury_fixture):
    ds = MiddleburyDataset(list_file=middlebury_fixture)
    o = ds[0]
    assert o["fs"].shape == (15, 64, 64, 3)
    assert o["depth"].shape == (40, 56)
    np.testing.assert_allclose(o["focus_dists"], np.linspace(10, 60, 15))
    # clamp to [10, 60] -> 0 + mask
    d = o["depth"]
    assert np.all(d[o["mask"]] >= 10) and np.all(d[o["mask"]] <= 60)
    assert np.all(d[~o["mask"]] == 0.0)


def test_loader_batching(fs6_dir):
    ds = DefocusNetDataset(root=fs6_dir, mode="test")
    batches = list(Loader(ds, batch_size=2, num_threads=2))
    assert len(batches) == 1
    assert batches[0]["fs"].shape == (2, 5, 256, 256, 3)
    assert batches[0]["focus_dists"].shape == (2, 5)


def test_native_io_matches_numpy(rng):
    from dffx.data import native

    stack = rng.integers(0, 256, (5, 47, 72, 3)).astype(np.uint8)
    out = native.normalize_pad_stack(stack)
    ref = np.pad(
        stack.astype(np.float32) / 127.5 - 1.0,
        ((0, 0), (0, 17), (0, 24), (0, 0)),
        constant_values=-1.0,
    )
    assert out.shape == (5, 64, 96, 3)
    np.testing.assert_array_equal(out, ref)

    hwcn = rng.uniform(0, 255, (32, 40, 3, 5))
    np.testing.assert_allclose(
        native.hwcn_to_nhwc_normalize(hwcn),
        ((hwcn / 127.5 - 1.0).transpose(3, 0, 1, 2)).astype(np.float32),
        atol=1e-6,
    )


def test_simulated_scenes_dataset_roundtrip(tmp_path, rng):
    """Simulator output -> SimulatedScenesDataset -> e2e train batch."""
    from dffx.data import SimulatedScenesDataset
    from dffx.sim import DEVICE_PROFILES, generate_scene

    import cv2
    import scipy.io as sio

    image = rng.uniform(0, 255, (64, 96, 3)).astype(np.float32)
    depth = rng.uniform(0.1, 1.1, (64, 96))
    out = generate_scene(
        image, depth, profile=DEVICE_PROFILES[0], rng=np.random.default_rng(0),
        pixel_vs_meter=1 / 0.0000014 * 96 / 4080, num_imgs=4, num_planes=50,
    )
    scene = tmp_path / "0"
    scene.mkdir()
    for i, img in enumerate(out["imgs"]):
        cv2.imwrite(str(scene / f"img{i}.png"), img)
    sio.savemat(str(scene / "depth.mat"), {"depth": out["depth"], "defocus": out["disparity"]})
    sio.savemat(str(scene / "camera_param.mat"), out["camera_setting"])

    ds = SimulatedScenesDataset(str(tmp_path), mode="train", num_imgs=4, crop=32)
    assert len(ds) == 1
    s = ds[0]
    assert s["fs"].shape == (4, 32, 32, 3)
    assert s["fovs"].shape == (4,) and s["focus_dists"].shape == (4,)
    assert np.isfinite(s["fs"]).all() and s["mask"].any()
    ds_val = SimulatedScenesDataset(str(tmp_path), mode="val", num_imgs=4)
    assert ds_val[0]["fs"].shape == (4, 64, 96, 3)


def test_native_imread_matches_cv2(tmp_path):
    """csrc libjpeg/libpng decode must be byte-identical to cv2.imread
    (BGR uint8) — the loaders' byte parity with the reference depends on it."""
    import cv2

    from dffx.data import native

    if not native.available():
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (48, 64, 3), dtype=np.uint8)
    p = str(tmp_path / "x.png")
    cv2.imwrite(p, img)
    got = native.imread(p)
    np.testing.assert_array_equal(got, cv2.imread(p))
    np.testing.assert_array_equal(got, img)  # png is lossless

    jp = str(tmp_path / "x.jpg")
    cv2.imwrite(jp, img, [cv2.IMWRITE_JPEG_QUALITY, 90])
    np.testing.assert_array_equal(native.imread(jp), cv2.imread(jp))


def test_native_imread_punts_alpha_and_16bit_pngs(tmp_path):
    """Alpha-channel and 16-bit PNGs decode differently under libpng's
    simplified API than under cv2.imread (alpha composited vs dropped;
    16->8-bit rescale differs) — the native path must return None so
    imread_compat's cv2 fallback keeps byte parity."""
    import cv2

    from dffx.data import native

    if not native.available():
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(1)
    pa = str(tmp_path / "rgba.png")
    cv2.imwrite(pa, rng.integers(0, 256, (24, 32, 4), dtype=np.uint8))
    assert native.imread(pa) is None
    np.testing.assert_array_equal(native.imread_compat(pa), cv2.imread(pa))

    p16 = str(tmp_path / "u16.png")
    cv2.imwrite(p16, rng.integers(0, 65536, (24, 32, 3), dtype=np.uint16))
    assert native.imread(p16) is None
    np.testing.assert_array_equal(native.imread_compat(p16), cv2.imread(p16))

    # 8-bit grayscale stays on the native path and keeps parity
    pg = str(tmp_path / "gray.png")
    cv2.imwrite(pg, rng.integers(0, 256, (24, 32), dtype=np.uint8))
    got = native.imread(pg)
    assert got is not None
    np.testing.assert_array_equal(got, cv2.imread(pg))


def test_native_tiff_imread_matches_cv2(tmp_path):
    """libtiff decode of 8-bit TIFFs must match cv2.imread byte-for-byte —
    the DefocusNet `All.tif` focal stacks are the loader hot path
    (`train_Dataloader.py:84,104`)."""
    import cv2

    from dffx.data import native

    if not native.available():
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, (48, 64, 3), dtype=np.uint8)
    p = str(tmp_path / "color.tif")
    cv2.imwrite(p, img)
    got = native.imread(p)
    assert got is not None
    np.testing.assert_array_equal(got, cv2.imread(p))
    np.testing.assert_array_equal(got, img)

    pg = str(tmp_path / "gray.tif")
    cv2.imwrite(pg, rng.integers(0, 256, (48, 64), dtype=np.uint8))
    got = native.imread(pg)
    assert got is not None
    np.testing.assert_array_equal(got, cv2.imread(pg))


def test_native_imread_unchanged_matches_cv2(tmp_path):
    """IMREAD_UNCHANGED semantics (native dtype, gray stays single-channel,
    color comes back BGR) across the GT formats the reference reads raw:
    16-bit/8-bit PNG (Smartphone merged depth, `train_Dataloader.py:341`)
    and float32/16-bit TIFF depth maps."""
    import cv2

    from dffx.data import native

    if not native.available():
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(3)
    cases = [
        ("g16.png", rng.integers(0, 65536, (24, 32), dtype=np.uint16)),
        ("g8.png", rng.integers(0, 256, (24, 32), dtype=np.uint8)),
        ("c8.png", rng.integers(0, 256, (24, 32, 3), dtype=np.uint8)),
        ("c16.png", rng.integers(0, 65536, (24, 32, 3), dtype=np.uint16)),
        ("g16.tif", rng.integers(0, 65536, (24, 32), dtype=np.uint16)),
        ("f32.tif", rng.standard_normal((24, 32)).astype(np.float32) * 50),
        ("c8.tif", rng.integers(0, 256, (24, 32, 3), dtype=np.uint8)),
    ]
    for name, img in cases:
        p = str(tmp_path / name)
        assert cv2.imwrite(p, img)
        got = native.imread_unchanged(p)
        ref = cv2.imread(p, cv2.IMREAD_UNCHANGED)
        assert got is not None, name
        assert got.dtype == ref.dtype and got.shape == ref.shape, name
        np.testing.assert_array_equal(got, ref, err_msg=name)

    # alpha PNG: unsupported natively -> None, and the compat wrapper keeps
    # parity through the cv2 fallback
    pa = str(tmp_path / "rgba.png")
    cv2.imwrite(pa, rng.integers(0, 256, (24, 32, 4), dtype=np.uint8))
    assert native.imread_unchanged(pa) is None
    np.testing.assert_array_equal(
        native.imread_unchanged_compat(pa), cv2.imread(pa, cv2.IMREAD_UNCHANGED)
    )


def test_loaders_run_without_cv2(fs6_dir, tmp_path, monkeypatch):
    """The reference-format hot paths must be fully native: with cv2 made
    unimportable, the TIFF focal-stack loader (DefocusNet `All.tif`) and the
    raw-PNG GT read still work through csrc."""
    import sys

    import cv2  # fixtures are written first, while cv2 is still importable

    from dffx.data import native
    from dffx.data.datasets import _read_depth_any

    if not native.available():
        pytest.skip("native library unavailable")
    p16 = str(tmp_path / "d16.png")
    cv2.imwrite(
        p16, np.random.default_rng(5).integers(0, 65536, (32, 32), dtype=np.uint16)
    )
    monkeypatch.setitem(sys.modules, "cv2", None)  # import cv2 now raises
    ds = DefocusNetDataset(root=fs6_dir, mode="test")
    s = ds[0]
    assert s["fs"].shape == (5, 256, 256, 3) and np.isfinite(s["fs"]).all()
    d = _read_depth_any(p16)
    assert d.dtype == np.float32 and d.shape == (32, 32)


def test_device_prefetch_propagates_loader_errors():
    """A decode error mid-epoch must raise, not silently truncate the epoch
    (the prefetch producer runs in a daemon thread)."""
    from dffx.data import Loader, device_prefetch

    class Bad:
        def __len__(self):
            return 4

        def __getitem__(self, i):
            if i == 2:
                raise RuntimeError("decode boom")
            return {"fs": np.zeros((2, 32, 32, 3), np.float32)}

    with pytest.raises(RuntimeError, match="decode boom"):
        for _ in device_prefetch(iter(Loader(Bad(), 2, num_threads=1))):
            pass


def test_device_prefetch_releases_producer_on_early_exit():
    """Abandoning the generator early (--steps-per-epoch break) must unblock
    the producer thread — a plain buf.put would pin it (and the Loader's
    thread pool) for the process lifetime, leaking threads per epoch."""
    import threading
    import time

    from dffx.data import device_prefetch

    done = threading.Event()

    def source():
        try:
            for i in range(1000):
                yield {"x": np.full((4,), i, np.float32)}
        finally:
            done.set()  # GeneratorExit or exhaustion — either releases us

    gen = device_prefetch(source(), size=2)
    next(gen)
    gen.close()  # consumer walks away after one batch
    deadline = time.monotonic() + 5.0
    while not done.is_set() and time.monotonic() < deadline:
        time.sleep(0.05)
    assert done.is_set(), "producer thread still blocked after consumer exit"
