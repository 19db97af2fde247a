"""Prior correction for the bin-balanced grasp-quality net.

The net trains on bin-BALANCED draws (config_grasp balance_bins) so its
softmax estimates p(bin|x) under a uniform prior; scoring naturally
distributed val rows without reweighting by the train marginal inflates CE
above the marginal entropy even for a well-ranked model (round-3 finding,
VERDICT r3 missing #2).  These tests pin the Bayes algebra the trainer
(prior.json) and scripts/graspnet_diag.py now share.
"""
import json
import subprocess
import sys

import numpy as np


def _correct(probs, prior):
    p = probs * prior[None, :]
    return p / p.sum(-1, keepdims=True)


def test_uninformative_model_corrects_to_marginal_entropy():
    # an x-blind balanced model outputs uniform probs; on a skewed natural
    # val distribution its raw CE is log(nb) > marginal entropy, while the
    # prior-corrected CE equals the marginal entropy exactly
    rng = np.random.default_rng(0)
    nb, n = 10, 20000
    prior = np.array([0.35, .02, .02, .03, .03, .04, .04, .05, .07, 0.35])
    labels = rng.choice(nb, size=n, p=prior)
    probs = np.full((n, nb), 1.0 / nb)
    ce_raw = -np.log(probs[np.arange(n), labels]).mean()
    ent = -(prior * np.log(prior)).sum()
    assert ce_raw > ent + 0.1  # the round-3 artifact
    cp = _correct(probs, prior)
    ce = -np.log(cp[np.arange(n), labels]).mean()
    emp = np.bincount(labels, minlength=nb) / n
    emp_ent = -(emp[emp > 0] * np.log(emp[emp > 0])).sum()
    assert abs(ce - emp_ent) < 5e-3


def test_informative_model_beats_marginal_after_correction():
    # balanced-posterior model with real signal: correction keeps CE strictly
    # below the marginal entropy (Bayes posterior is optimal given its lik.)
    rng = np.random.default_rng(1)
    nb, n = 10, 20000
    prior = np.array([0.35, .02, .02, .03, .03, .04, .04, .05, .07, 0.35])
    labels = rng.choice(nb, size=n, p=prior)
    # balanced posterior: bump the true bin, renormalize
    probs = np.full((n, nb), 1.0)
    probs[np.arange(n), labels] += 2.0
    probs /= probs.sum(-1, keepdims=True)
    cp = _correct(probs, prior)
    ce = -np.log(cp[np.arange(n), labels]).mean()
    ent = -(prior * np.log(prior)).sum()
    assert ce < ent - 0.1


def test_train_grasp_writes_prior(tmp_path):
    # the trainer-side computation: digitize + bincount + laplace smoothing
    classes = np.array([0, 0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9, 1.01],
                       np.float32)
    scores = np.array([0.0, 0.05, 0.95, 1.0, 0.51], np.float32)
    bins = np.digitize(scores, classes) - 1
    assert bins.tolist() == [0, 0, 9, 9, 5]
    prior = np.bincount(bins, minlength=len(classes) - 1) + 1.0
    prior = prior / prior.sum()
    assert abs(prior.sum() - 1.0) < 1e-12 and (prior > 0).all()


def test_graspnet_diag_compiles():
    # the diag script must at least import/compile (its data deps are
    # regenerated per round, so a full run is chain-only)
    rc = subprocess.run([sys.executable, "-m", "py_compile",
                         "scripts/graspnet_diag.py"], cwd="/root/repo")
    assert rc.returncode == 0
