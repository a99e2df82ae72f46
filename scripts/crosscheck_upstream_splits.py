#!/usr/bin/env python
"""Cross-check the vendored split re-derivations against live upstream.

The vendored splitters (``fairmultimodal_tpu/data/iterstrat_exact.py``)
re-derive two third-party packages the reference splits with
(``iterative-stratification`` for 01/04/05/06/07/08/10,
``scikit-multilearn`` for 02/03) because neither is installable in the
build environment.  Their exactness is pinned by golden index sets, but a
cross-check against the *live* packages was an environment-blocked debt
(ROADMAP.md).  This script IS that check: run it anywhere both packages
install (``pip install iterative-stratification scikit-multilearn``) and it
compares index sets over a battery of reference-shaped label matrices.

Exit codes: 0 = both packages imported and all comparisons match,
1 = mismatch (vendored code needs fixing), 2 = at least one upstream
package not importable, so the run was partial or fully skipped (the
environment cannot run the check — not a failure of the vendored code).

skmultilearn caveat: upstream breaks ties through the GLOBAL unseeded
``np.random`` (the reference never seeds it — its own 02/03 splits are not
run-to-run reproducible).  The vendored version uses an explicit
``RandomState(seed)``.  For comparison we seed the global stream with the
same seed so both consume identical variates; the iterstrat comparison has
no such caveat (all randomness flows through ``RandomState(random_state)``).
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _label_battery(rng: np.random.Generator):
    """Reference-shaped label matrices: 3-task multi-hot (mort/los/vent at
    roughly MIMIC prevalences), the 2-task legacy shape, and edge cases."""
    cases = []
    for n in (50, 333, 1000, 4000):
        y = np.stack([
            rng.random(n) < 0.12,          # mortality ~12%
            rng.random(n) < 0.55,          # prolonged LOS ~55%
            rng.random(n) < 0.35,          # ventilation ~35%
        ], axis=1).astype(int)
        cases.append((f"3task_n{n}", y))
    y2 = np.stack([rng.random(800) < 0.10, rng.random(800) < 0.30],
                  axis=1).astype(int)
    cases.append(("2task_n800", y2))
    # All-zero rows (patients with no positive label) — common in MIMIC.
    y3 = np.zeros((200, 3), dtype=int)
    y3[rng.choice(200, 40, replace=False), 0] = 1
    cases.append(("sparse_n200", y3))
    return cases


def check_iterstrat(cases, seeds=(42, 0, 7)) -> int:
    from fairmultimodal_tpu.data.iterstrat_exact import (
        multilabel_stratified_shuffle_split,
    )

    try:
        from iterstrat.ml_stratifiers import MultilabelStratifiedShuffleSplit
    except ImportError as e:
        print(f"SKIP iterstrat: upstream not importable ({e})")
        return 2

    failures = 0
    for name, y in cases:
        for seed in seeds:
            for test_size in (0.2, 0.3, 0.5):
                X = np.zeros((len(y), 1))
                msss = MultilabelStratifiedShuffleSplit(
                    n_splits=1, test_size=test_size, random_state=seed)
                up_train, up_test = next(msss.split(X, y))
                v_train, v_test = multilabel_stratified_shuffle_split(
                    y, test_size=test_size, seed=seed)
                ok = (np.array_equal(np.sort(up_train), v_train)
                      and np.array_equal(np.sort(up_test), v_test))
                tag = "ok" if ok else "MISMATCH"
                if not ok:
                    failures += 1
                    both = set(up_test) & set(v_test)
                    print(f"  iterstrat {name} seed={seed} ts={test_size}: "
                          f"{tag} (test overlap {len(both)}/{len(v_test)})")
    print(f"iterstrat: {'PASS' if failures == 0 else f'{failures} FAILURES'}")
    return 0 if failures == 0 else 1


def check_skmultilearn(cases, seeds=(42, 0, 7)) -> int:
    from fairmultimodal_tpu.data.iterstrat_exact import (
        iterative_train_test_split as vendored_split,
    )

    try:
        from skmultilearn.model_selection import (
            iterative_train_test_split as upstream_split,
        )
    except ImportError as e:
        print(f"SKIP skmultilearn: upstream not importable ({e})")
        return 2

    failures = 0
    for name, y in cases:
        for seed in seeds:
            for test_size in (0.2, 0.3):
                X = np.arange(len(y)).reshape(-1, 1)
                # Upstream ties consume the GLOBAL np.random; align it with
                # the vendored explicit RandomState(seed) stream.
                np.random.seed(seed)
                X_tr, _, X_te, _ = upstream_split(
                    X, np.asarray(y), test_size=test_size)
                up_train = np.sort(X_tr.ravel())
                up_test = np.sort(X_te.ravel())
                v_train, v_test = vendored_split(y, test_size=test_size,
                                                 seed=seed)
                ok = (np.array_equal(up_train, v_train)
                      and np.array_equal(up_test, v_test))
                if not ok:
                    failures += 1
                    both = set(up_test.tolist()) & set(v_test.tolist())
                    print(f"  skmultilearn {name} seed={seed} ts={test_size}:"
                          f" MISMATCH (test overlap {len(both)}/{len(v_test)})")
    print(f"skmultilearn: {'PASS' if failures == 0 else f'{failures} FAILURES'}")
    return 0 if failures == 0 else 1


def main() -> int:
    cases = _label_battery(np.random.default_rng(20240819))
    r1 = check_iterstrat(cases)
    r2 = check_skmultilearn(cases)
    codes = {r1, r2}
    if 1 in codes:
        return 1
    if 2 in codes:
        # Any skipped sub-check is a partial run, never "all match" (advisor
        # r4): reserve 0 for both packages actually imported and passing.
        return 2
    return 0


if __name__ == "__main__":
    sys.exit(main())
