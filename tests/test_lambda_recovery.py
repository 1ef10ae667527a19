"""Known-answer integration test (SURVEY.md §4 item 4).

The synthetic Gauss-pulse task has an analytically optimal window width
sigma_ref = 6.38 (search_spaces.py:71).  Training DMEL from bad inits
must (a) recover lambda toward sigma_ref and (b) beat the frozen
baseline started at the same bad init.
"""

import numpy as np
import pytest

from dmel_tpu import data, training


def cfg(init_lambd, trainable, max_epochs):
    return dict(
        model_name="linear_net", hop_length=1, optimized=False,
        normalize_window=False, optimizer_name="sgd", lr_model=1e-3,
        lr_tf=1.0, batch_size=128, trainable=trainable,
        max_epochs=max_epochs, patience=100, n_points=128, noise_std=0.5,
        init_lambd=init_lambd, n_samples=1200, sigma_ref=6.38,
        dataset_name="time_frequency", center_offset=False, data_seed=7)


SIGMA_REF = 6.38


@pytest.mark.slow
class TestLambdaRecovery:
    def test_recovers_from_large_init(self):
        c = cfg(5.0 * SIGMA_REF, True, 25)
        tr, va, te = data.get_dataset_by_config(c, "/tmp")
        state, hist = training.fit(c, tr, va, seed=0)
        lam = abs(hist["est_lambd"])
        # moved from 31.9 most of the way to 6.38
        assert lam < 12.0, f"lambda stuck at {lam}"
        traj = [r["lambd_est"] for r in hist["records"]]
        assert traj[0] > traj[-1]  # monotone-ish downward trend

    def test_recovers_from_small_init_and_beats_baseline(self):
        c_train = cfg(0.2 * SIGMA_REF, True, 25)
        tr, va, te = data.get_dataset_by_config(c_train, "/tmp")
        state_t, hist_t = training.fit(c_train, tr, va, seed=0)
        lam = abs(hist_t["est_lambd"])
        assert lam > 2.5, f"lambda stuck at {lam} (init 1.276)"

        c_fixed = cfg(0.2 * SIGMA_REF, False, 25)
        state_f, hist_f = training.fit(c_fixed, tr, va, seed=0)

        lt, pt = training.predict(c_train, state_t, te)
        lf, pf = training.predict(c_fixed, state_f, te)
        acc_t = float(np.mean(lt == pt))
        acc_f = float(np.mean(lf == pf))
        # DMEL >= baseline at a bad init (paper's headline claim)
        assert acc_t >= acc_f - 0.02, (acc_t, acc_f)
        assert acc_t > 0.8
