"""Pipeline regression goldens (VERDICT round-1 item 7).

``cli/goldens.py`` runs the full train -> embed -> rank -> report pipeline
on a seeded synthetic corpus. The ``ci`` preset re-runs here on the CPU
backend and must reproduce the checked-in ``goldens/ci_cpu.json`` EXACTLY
(same backend + same seeds -> deterministic loader order, negative
sampling, init, and CPU matmuls). The ``scale`` preset's TPU golden
(``goldens/scale_tpu.json``) is validated structurally — bf16 TPU numerics
are not reproducible on the CPU suite, but the recorded run must satisfy
the >= 5k gallery / >= 1k queries contract with sane metrics.
"""

import json
import math
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
GOLDENS = REPO / "goldens"


def test_scale_tpu_golden_contract():
    path = GOLDENS / "scale_tpu.json"
    assert path.is_file(), "goldens/scale_tpu.json missing - run " \
        "`python -m art_sbir_tpu.cli.goldens --preset scale` on the TPU chip"
    g = json.loads(path.read_text())
    assert g["backend"] != "cpu"
    assert g["n_gallery"] >= 5000
    assert g["n_queries"] >= 1000
    assert 0.0 < g["mrr"] <= 1.0
    assert len(g["topk_acc"]) == 10
    assert all(0.0 <= a <= 1.0 for a in g["topk_acc"])
    assert g["topk_acc"] == sorted(g["topk_acc"])  # recall@k is monotone
    assert 1.0 <= g["rank_mean"] <= g["n_gallery"]
    assert math.isfinite(g["final_train_loss"])
    assert g["wall_times_s"]["train_embed_rank_report"] > 0


@pytest.mark.slow
def test_ci_preset_reproduces_golden(tmp_path):
    path = GOLDENS / "ci_cpu.json"
    assert path.is_file(), "goldens/ci_cpu.json missing - run " \
        "`python -m art_sbir_tpu.cli.goldens --preset ci` on this backend"
    want = json.loads(path.read_text())
    assert want["backend"] == "cpu"

    from art_sbir_tpu.cli.goldens import run

    got = run("ci", tmp_path / "data", tmp_path / "results",
              seed=want["seed"])
    assert got["n_gallery"] == want["n_gallery"]
    assert got["n_queries"] == want["n_queries"]
    assert got["mrr"] == pytest.approx(want["mrr"], rel=1e-6)
    assert got["topk_acc"] == pytest.approx(want["topk_acc"], rel=1e-6)
    assert got["rank_mean"] == pytest.approx(want["rank_mean"], rel=1e-6)
    assert got["final_train_loss"] == pytest.approx(
        want["final_train_loss"], rel=1e-5)
    assert got["final_test_loss"] == pytest.approx(
        want["final_test_loss"], rel=1e-5)


@pytest.mark.slow
def test_vae_ci_preset_reproduces_golden(tmp_path):
    """Photo2Sketch VAE loss-trajectory golden (VERDICT r2 item 7): the
    seeded 2-epoch CPU run reproduces goldens/vae_ci_cpu.json exactly."""
    path = GOLDENS / "vae_ci_cpu.json"
    assert path.is_file(), "run `python -m art_sbir_tpu.cli.goldens " \
        "--preset vae_ci` on this backend"
    want = json.loads(path.read_text())
    assert want["backend"] == "cpu"

    from art_sbir_tpu.cli.goldens import run_generative

    got = run_generative("vae_ci", tmp_path / "vae_ci")
    for split in ("train_losses", "test_losses"):
        for k, series in want[split].items():
            assert got[split][k] == pytest.approx(series, rel=1e-6), (split, k)


@pytest.mark.slow
def test_gan_ci_preset_reproduces_golden(tmp_path):
    """pix2pix GAN loss-trajectory golden: seeded 2-epoch CPU run
    reproduces goldens/gan_ci_cpu.json exactly (G_GAN/G_L1/D_real/D_fake)."""
    path = GOLDENS / "gan_ci_cpu.json"
    assert path.is_file(), "run `python -m art_sbir_tpu.cli.goldens " \
        "--preset gan_ci` on this backend"
    want = json.loads(path.read_text())
    assert want["backend"] == "cpu"

    from art_sbir_tpu.cli.goldens import run_generative

    got = run_generative("gan_ci", tmp_path / "gan_ci")
    for k, series in want["train_losses"].items():
        assert got["train_losses"][k] == pytest.approx(series, rel=1e-6), k


def test_learn_tpu_golden_contract():
    """The learning-curve golden (VERDICT r2 item 1): the flagship recipe
    on the LEARNABLE corpus must end >= 10x above the random-ranking
    expectation with a generally-rising per-epoch curve — the regression
    lock on 'gradient steps move recall'."""
    path = GOLDENS / "learn_tpu.json"
    assert path.is_file(), "goldens/learn_tpu.json missing - run " \
        "`python -m art_sbir_tpu.cli.goldens --preset learn` on the TPU chip"
    g = json.loads(path.read_text())
    assert g["backend"] != "cpu"
    assert g["config"]["learnable"] is True
    chance = g["chance_mrr"]
    assert 0 < chance < 0.05
    curve = g["epoch_metrics"]
    assert len(curve) == g["config"]["epochs"]
    mrrs = [e["mrr"] for e in curve]
    assert g["mrr"] == pytest.approx(mrrs[-1], rel=1e-6)
    # final MRR >= 10x chance; curve rises (first -> last, and the best
    # epoch is not the first — BN warmup makes strict monotonicity too
    # brittle to pin)
    assert mrrs[-1] >= 10 * chance, (mrrs, chance)
    assert mrrs[-1] > mrrs[0]
    assert max(mrrs) > 2 * mrrs[0] or mrrs[0] >= 10 * chance
    top10 = [e["top10"] for e in curve]
    assert top10[-1] > top10[0]
    assert all(0 <= t <= 1 for t in top10)


def test_scale_learn_tpu_golden_contract():
    """Scale-level learnability (VERDICT r2 item 8): the flagship recipe on
    the LEARNABLE corpus at full 224^2 / 5.6k-gallery scale must end well
    above the random-ranking expectation — the at-scale counterpart of
    test_learn_tpu_golden_contract (the original scale golden keeps the
    unlearnable corpus for wall-time/pipeline lineage)."""
    path = GOLDENS / "scale_learn_tpu.json"
    assert path.is_file(), "goldens/scale_learn_tpu.json missing - run " \
        "`python -m art_sbir_tpu.cli.goldens --preset scale_learn` on the TPU"
    g = json.loads(path.read_text())
    assert g["backend"] != "cpu"
    assert g["config"]["learnable"] is True
    assert g["n_gallery"] >= 5000
    assert g["n_queries"] >= 5000
    chance = g["chance_mrr"]
    assert 0 < chance < 0.005
    assert g["mrr"] >= 10 * chance, (g["mrr"], chance)
    curve = g["epoch_metrics"]
    assert len(curve) == g["config"]["epochs"]
    assert curve[-1]["mrr"] > 10 * chance
    assert g["topk_acc"] == sorted(g["topk_acc"])


def test_ann_learned_tpu_golden_contract():
    """ANN tiers on TRAINED-encoder embeddings (VERDICT r3 item 2): the
    serving-tier quality contracts, previously measured only on synthetic
    geometry, must hold on the embedding distribution an actually-trained
    flagship encoder emits at >=50k-gallery scale with REAL cross-modal
    sketch queries (scripts/probe_ann_learned.py)."""
    path = GOLDENS / "ann_learned_tpu.json"
    assert path.is_file(), "goldens/ann_learned_tpu.json missing - run " \
        "`python scripts/probe_ann_learned.py` on the TPU chip"
    g = json.loads(path.read_text())
    assert g["backend"] != "cpu"
    assert g["corpus"]["learnable"] is True
    assert g["n_gallery"] >= 50_000
    # the full committed-script run: all 10 classes, ~1000 real sketch
    # queries (the round-4 golden's 100 single-class queries measured
    # unrepresentative — ADVICE r4 / the round-5 proxy-optimism finding)
    assert g["n_queries"] >= 500
    # the encoder is genuinely trained: far above the random-ranking
    # expectation on the full distractor-laden gallery
    assert g["mrr"] >= 50 * g["chance_mrr"], (g["mrr"], g["chance_mrr"])
    # int8 + exact rerank keeps the synthetic-geometry overlap contract
    # on learned embeddings at the serving rerank budget
    assert g["int8_overlap"]["r40"] >= 0.97
    # IVF recall@10 rises monotonically in nprobe (probe-set inclusion)
    sweep = [g["ivf_recall"][k] for k in
             sorted(g["ivf_recall"], key=int)]
    assert all(b >= a - 1e-9 for a, b in zip(sweep, sweep[1:])), sweep
    # round-5 discovery: the perturbed-row proxy is ~one power of two
    # OPTIMISTIC vs real cross-modal queries at scale (proxy picked 8,
    # real sketches needed 16, recall at the proxy's raw pick 0.852).
    # The SHIPPED auto mode applies margin=2 (retrieval/server.py /
    # ops/ivf.py::tune_nprobe) — the contract is on what actually
    # serves, and the raw-proxy gap is locked as documentation.
    tn = g["tune_nprobe"]
    assert tn["serving_choice"] >= tn["proxy_choice"], tn
    assert tn["real_recall_at_serving_choice"] >= 0.93, tn
    assert (tn["real_recall_at_serving_choice"]
            >= tn["real_recall_at_proxy_choice"] - 1e-9), tn
    # rerank can only help at fixed nprobe — at the legacy nprobe=8
    # column AND the served operating point (VERDICT r4 weak #4: the
    # operating point must have a recorded IVF-PQ recall)
    pq = g["ivf_pq_recall"]
    sc = tn["serving_choice"]
    for np_ in {8, sc}:
        assert pq[f"np{np_}_r640"] >= pq[f"np{np_}_pure"] - 1e-9
    # more probes can only widen the candidate set the rerank sees
    assert pq[f"np{sc}_r640"] >= pq["np8_r640"] - 1e-9, pq
