"""CGP logistic-regression trainer (reference src/train_logReg_param.cc)."""

import numpy as np
import pytest

from augustus_tpu.cgp.train_logreg import (cross_entropy, predict_proba,
                                           read_cfg, train, write_cfg)


def _synthetic(n=400, seed=0):
    rng = np.random.RandomState(seed)
    X = rng.randn(n, 3)
    w_true = np.array([0.5, 2.0, -1.5, 0.7])
    z = w_true[0] + X @ w_true[1:]
    y = (1 / (1 + np.exp(-z)) > rng.rand(n)).astype(int)
    return [(int(yi), [1.0] + list(xi)) for yi, xi in zip(y, X)]


def test_train_separates_classes():
    samples = _synthetic()
    model = train(samples)
    p = predict_proba(np.array([s[1] for s in samples]), model)
    y = np.array([s[0] for s in samples])
    acc = ((p > 0.5) == y).mean()
    assert acc > 0.75   # ~Bayes accuracy for this noise level
    # training reduced the loss vs the zero-weight model
    zero = {"weights": np.zeros(4), "mean": model["mean"],
            "se": model["se"]}
    assert cross_entropy(samples, model) < cross_entropy(samples, zero)


def test_cfg_roundtrip(tmp_path):
    model = train(_synthetic(100))
    path = tmp_path / "params.cfg"
    write_cfg(str(path), exon_model=model, intron_model=model)
    back = read_cfg(str(path))
    assert np.allclose(
        [back["exon"][i] for i in sorted(back["exon"])],
        model["weights"], atol=1e-7)
    assert back["intron"] == back["exon"]


def test_reads_reference_cfg():
    """Parses the shipped log_reg_parameters files (the weight format
    the reference's CGP consumes)."""
    import os
    path = "/root/reference/config/cgp/log_reg_parameters_default.cfg"
    if not os.path.exists(path):
        pytest.skip("reference cgp config missing")
    w = read_cfg(path)
    assert w["exon"], "no exon weights parsed"
    assert 0 in w["exon"], "intercept missing"
