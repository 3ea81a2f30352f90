"""Dataset layer: split parity, catalog pairing/negatives, loader batches."""

from pathlib import Path

import numpy as np
import pytest

from art_sbir_tpu.data import get_datasets
from art_sbir_tpu.data.loader import TripletLoader, GalleryLoader
from art_sbir_tpu.data.split import split_indices
from art_sbir_tpu.data.synthetic import make_synthetic_kaggle, make_synthetic_sketchy


@pytest.fixture(scope="module")
def sketchy_root(tmp_path_factory):
    return make_synthetic_sketchy(tmp_path_factory.mktemp("sketchy"), with_svg=True)


@pytest.fixture(scope="module")
def kaggle_root(tmp_path_factory):
    return make_synthetic_kaggle(tmp_path_factory.mktemp("kaggle"))


def test_split_matches_sklearn():
    from sklearn.model_selection import train_test_split

    data = list(range(37))
    tr_ref, te_ref = train_test_split(data, test_size=0.1, random_state=42,
                                      shuffle=True)
    tr, te = split_indices(37, 0.1, 42)
    assert [data[i] for i in tr] == tr_ref
    assert [data[i] for i in te] == te_ref


def test_sketchy_v1_pairing_and_split(sketchy_root):
    train, test = get_datasets("SketchyV1", size=1.0, root=sketchy_root)
    assert len(train) + len(test) == 18  # 3 classes * 3 photos * 2 sketches
    assert len(test) == 2  # ceil(0.1 * 18)
    for cat in (train, test):
        for s, p in zip(cat.sketch_paths, cat.photo_paths):
            assert p.stem in s.stem  # nX_Y pairing
            assert s.parent.name == p.parent.name  # same class
    # determinism
    train2, _ = get_datasets("SketchyV1", size=1.0, root=sketchy_root)
    assert train.sketch_paths == train2.sketch_paths


def test_sketchy_size_selects_class_prefix(sketchy_root):
    train, test = get_datasets("SketchyV1", size=0.34, root=sketchy_root)
    classes = {p.parent.name for p in train.photo_paths + test.photo_paths}
    assert classes == {"class00"}


def test_sketchy_v2_same_class_negative(sketchy_root):
    train, _ = get_datasets("SketchyV2", size=1.0, root=sketchy_root)
    for idx in range(len(train)):
        it = train.item(idx)
        assert it["negative"].parent.name == it["positive"].parent.name
        assert it["negative"] != it["positive"]
        assert it["label"] == train.classes_to_idx[it["positive"].parent.name]


def test_kaggle_v2_labels_and_negatives(kaggle_root):
    train, test = get_datasets("KaggleV2", size=1.0, root=kaggle_root)
    assert len(train) == 12 and len(test) == 6
    it = train.item(0)
    assert it["sketch"].name == "0.png"
    assert 0 <= it["label"] < len(train.styles)
    # genre-matched negative
    g = train.rows[0]["genre"]
    neg_idx = train.photo_paths.index(it["negative"])
    assert train.rows[neg_idx]["genre"] == g


def test_kaggle_test_genre_offset(kaggle_root):
    """test CSV lacks 'miniature' -> genres after it shift by one."""
    _, test = get_datasets("KaggleV2", size=1.0, root=kaggle_root)
    for i, r in enumerate(test.rows):
        label = test.genre_label(i)
        if r["genre"] > "miniature":
            assert label == test.genres[r["genre"]] + 1


def test_kaggle_sketch_type_list_random_source(kaggle_root):
    (kaggle_root / "opensketch_drawings").mkdir(exist_ok=True)
    for p in (kaggle_root / "contour_drawings").glob("*.png"):
        (kaggle_root / "opensketch_drawings" / p.name).write_bytes(p.read_bytes())
    train, _ = get_datasets(
        "KaggleV1", size=1.0, root=kaggle_root,
        sketch_type=["contour_drawings", "opensketch_drawings"],
    )
    sources = {train.item(0)["sketch"].parent.name for _ in range(20)}
    assert sources == {"contour_drawings", "opensketch_drawings"}


def test_kaggle_inference_catalog(kaggle_root):
    _, test = get_datasets("KaggleInferenceV1", sketch_type="sketches",
                           root=kaggle_root)
    assert len(test) == 6
    assert all(p.parent.name == "sketches" for p in test.sketch_paths)


def test_mixed_interleaving(sketchy_root, kaggle_root):
    train, test = get_datasets(
        "MixedDatasetV1", size=1.0, root_kaggle=kaggle_root,
        root_sketchy=sketchy_root, sketch_type="contour_drawings",
    )
    assert len(train) == 2 * max(len(train.kaggle), len(train.sketchy))
    # even -> kaggle, odd -> sketchy
    it0, it1 = train.item(0), train.item(1)
    assert "kaggle" in str(it0["positive"])
    assert "sketchy" in str(it1["positive"])
    assert len(test) == len(test.kaggle.sketch_paths)


def test_categorized_mixed_sentinel_label(sketchy_root, kaggle_root):
    train, _ = get_datasets(
        "CategorizedMixedDatasetV2", size=1.0, root_kaggle=kaggle_root,
        root_sketchy=sketchy_root,
    )
    assert train.item(1)["label"] == train.num_classes  # sketchy sentinel
    assert train.item(0)["label"] < train.num_classes


def test_triplet_loader_batches(sketchy_root):
    train, _ = get_datasets("SketchyV2", size=1.0, root=sketchy_root)
    loader = TripletLoader(train, batch_size=4, image_size=64)
    batches = list(loader)
    assert len(batches) == len(loader)
    b = batches[0]
    assert b["sketch"].shape == (4, 64, 64, 3) and b["sketch"].dtype == np.uint8
    assert b["label"].dtype == np.int32
    # sketches are mostly white, photos are noise
    assert b["sketch"].mean() > 180
    assert 100 < b["positive"].mean() < 160


def test_family_resize_mode_defaults(sketchy_root, kaggle_root):
    """Host-decode geometry per dataset family matches the transform the
    reference actually hands each one: model.transform = shortest-side +
    center crop for plain Sketchy/Kaggle (`models.py:289-295`,
    `train.py:152`), square image_transformV1 for Augmented/Mixed
    (`data_preparation.py:641,670,725`)."""
    for name, expect in [
        ("SketchyV1", "shortest_crop"),
        ("SketchyV2", "shortest_crop"),
        ("KaggleV1", "shortest_crop"),
        ("KaggleV2", "shortest_crop"),
        ("AugmentedKaggleV1", "square"),
        ("AugmentedKaggleV2", "square"),
    ]:
        root = sketchy_root if "Sketchy" in name else kaggle_root
        train, test = get_datasets(name, size=1.0, root=root)
        assert train.resize_mode == expect, name
        assert test.resize_mode == expect, name
        assert train.state_dict.get("resize_mode", expect) == expect
        # TripletLoader picks the catalog's mode up by default
        assert TripletLoader(train, batch_size=2).resize_mode == expect, name
        # explicit override still wins
        assert TripletLoader(train, batch_size=2,
                             resize_mode="square").resize_mode == "square"
    mixed_train, _ = get_datasets(
        "MixedDatasetV1", size=1.0, root_kaggle=kaggle_root,
        root_sketchy=sketchy_root, sketch_type="contour_drawings",
    )
    assert mixed_train.resize_mode == "square"
    cat_train, _ = get_datasets(
        "CategorizedMixedDatasetV2", size=1.0, root_kaggle=kaggle_root,
        root_sketchy=sketchy_root,
    )
    assert cat_train.resize_mode == "square"


def test_decode_image_shortest_crop_geometry(sketchy_root):
    """shortest_crop decode: non-square input -> shortest side resized to S,
    center S x S crop (torchvision Resize(S)+CenterCrop(S) semantics)."""
    from PIL import Image

    from art_sbir_tpu.data.loader import decode_image

    p = sketchy_root / "wide.png"
    arr = np.zeros((64, 128, 3), np.uint8)
    arr[:, 64:] = 255  # right half white: the center crop straddles it
    Image.fromarray(arr).save(p)
    out = decode_image(p, 32, "shortest_crop")
    assert out.shape == (32, 32, 3)
    # center 32-wide window of the 64x32-resized image: half black half white
    assert out[:, :12].mean() < 40 and out[:, -12:].mean() > 215
    sq = decode_image(p, 32, "square")
    assert sq.shape == (32, 32, 3)
    # square mode squashes the full width: left half black, right half white
    assert sq[:, :12].mean() < 40


def test_gallery_loader(sketchy_root):
    train, _ = get_datasets("SketchyV1", size=1.0, root=sketchy_root)
    gl = GalleryLoader(sorted(set(train.photo_paths)), image_size=64)
    n = min(2, len(gl))
    arr = gl(0, n)
    assert arr.shape == (n, 64, 64, 3)


def test_vectorized_sketchy_catalog(sketchy_root):
    train, test = get_datasets("VectorizedSketchyV1", size=1.0, root=sketchy_root,
                               img_format="svg")
    assert len(train) > 0
    it = train.item(0)
    assert it["sketch_vector"].shape == (100, 5)
    assert it["length"] > 10
    # cache created on disk and reusable
    assert (sketchy_root / "sketch_vectors_100_2_V2").is_dir()
    train2, _ = get_datasets("VectorizedSketchyV1", size=1.0, root=sketchy_root,
                             img_format="svg")
    np.testing.assert_allclose(
        train2.item(0)["sketch_vector"], it["sketch_vector"], rtol=1e-6
    )


def test_quickdraw_catalog(tmp_path):
    rng = np.random.default_rng(0)
    seqs = np.empty(30, object)
    for i in range(30):
        n = rng.integers(12, 60)
        s = np.zeros((n, 3), np.float32)
        s[:, :2] = rng.standard_normal((n, 2)) * 20
        s[:, 2] = rng.random(n) < 0.2
        seqs[i] = s
    d = tmp_path / "quick_draw"
    d.mkdir()
    for cat in ["apple"]:
        np.savez(d / f"{cat}.npz", train=seqs[:20], valid=seqs[20:], test=seqs[25:])
    from art_sbir_tpu.data.quickdraw import QuickDrawCatalogV1

    cat = QuickDrawCatalogV1(mode="train", size=1.0, root=d, categories=["apple"])
    assert len(cat) > 0
    it = cat.item(0)
    assert it["sketch_vector"].shape == (100, 5)
    assert abs(np.std(np.concatenate([s[:, :2].ravel() for s in cat.sketches])) - 1.0) < 0.05


def test_unpaired_catalog_second_domain_cycles(tmp_path):
    """Train-mode second domain: reference repeat-and-cutoff balancing
    (drawing_utils/dataset.py:87-105) — shorter list cycles, pairing by
    index, length = max(len(data), len(img2))."""
    from PIL import Image

    a, b = tmp_path / "a", tmp_path / "b"
    a.mkdir(); b.mkdir()
    for i in range(7):
        Image.new("RGB", (8, 8)).save(a / f"img{i:02d}.jpg")
    for i in range(3):
        Image.new("RGB", (8, 8)).save(b / f"line{i}.png")
    from art_sbir_tpu.data.unpaired import UnpairedImageCatalog

    cat = UnpairedImageCatalog(a, root2=b, mode="train")
    assert len(cat) == 7
    seconds = [cat.item(i)["image2"].name for i in range(len(cat))]
    assert seconds == ["line0.png", "line1.png", "line2.png"] * 2 + ["line0.png"]

    # img2 longer than data: data cycles up to len(img2)
    for i in range(3, 10):
        Image.new("RGB", (8, 8)).save(b / f"line{i}.png")
    cat2 = UnpairedImageCatalog(a, root2=b, mode="train")
    assert len(cat2) == 10
    assert cat2.item(7)["image"].name == "img00.jpg"

    # test mode ignores the second domain
    cat3 = UnpairedImageCatalog(a, root2=b, mode="test")
    assert len(cat3) == 7 and "image2" not in cat3.item(0)


def test_unpaired_catalog_depth_correspondence(tmp_path):
    """Depth mode rebuilds the image list FROM the depth maps (reference
    dataset.py:52-75): basename match, else <stem>.jpg, else dropped."""
    from PIL import Image

    imgs, depth = tmp_path / "imgs", tmp_path / "depth"
    imgs.mkdir(); depth.mkdir()
    Image.new("RGB", (8, 8)).save(imgs / "x1.png")   # exact basename match
    Image.new("RGB", (8, 8)).save(imgs / "x2.jpg")   # stem.jpg match
    Image.new("RGB", (8, 8)).save(imgs / "x3.jpg")   # no depth -> dropped
    Image.new("L", (8, 8)).save(depth / "x1.png")
    Image.new("L", (8, 8)).save(depth / "x2.png")
    Image.new("L", (8, 8)).save(depth / "x9.png")    # no image -> dropped
    from art_sbir_tpu.data.unpaired import UnpairedImageCatalog

    cat = UnpairedImageCatalog(imgs, depth_root=depth, mode="test")
    assert [p.name for p in cat.paths] == ["x1.png", "x2.jpg"]
    it0, it1 = cat.item(0), cat.item(1)
    assert it0["depth"].name == "x1.png" and it1["depth"].name == "x2.png"
    assert cat.state_dict["with_depth"]


def test_unpaired_catalog_registered(tmp_path):
    from PIL import Image

    a = tmp_path / "a"
    a.mkdir()
    Image.new("RGB", (8, 8)).save(a / "i.jpg")
    from art_sbir_tpu.data import DATASETS, get_datasets

    assert "UnpairedDepth" in DATASETS
    train, test = get_datasets("UnpairedDepth", root=a)
    assert len(train) == 1 and len(test) == 1
    assert test.state_dict["dataset"] == "UnpairedDepthDataset"
