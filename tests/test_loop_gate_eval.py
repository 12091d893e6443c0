"""eval.loop_gate: GT tagging + gate precision/recall bookkeeping."""

import numpy as np

from kintinuous_tpu.eval.loop_gate import tag_loop_log


def _traj(n=20, dt=1.0 / 30.0):
    stamps = np.arange(n) * dt
    poses = []
    for i in range(n):
        T = np.eye(4)
        T[0, 3] = 0.1 * i
        T[2, 3] = 0.02 * i
        poses.append(T)
    return stamps, np.stack(poses)


def _entry(t1_us, t2_us, T, accepted):
    return {"kf_t1": t1_us, "kf_t2": t2_us, "T_1_2": T.tolist(),
            "accepted": accepted}


def test_tags_genuine_and_aliased_candidates():
    stamps, poses = _traj()
    i, j = 3, 15
    T_gt = np.linalg.inv(poses[i]) @ poses[j]
    # genuine: measured matches GT to 2 cm; aliased: off by 1.5 m
    T_bad = T_gt.copy()
    T_bad[0, 3] += 1.5
    T_good = T_gt.copy()
    T_good[2, 3] += 0.02
    log = [
        _entry(int(stamps[i] * 1e6), int(stamps[j] * 1e6), T_good, True),
        _entry(int(stamps[i] * 1e6), int(stamps[j] * 1e6), T_bad, False),
    ]
    stats = tag_loop_log(log, stamps, poses)
    assert log[0]["gt_error_m"] < 0.05
    assert log[1]["gt_error_m"] > 1.0
    assert stats["n_tagged"] == 2 and stats["n_genuine"] == 1
    assert stats["loop_gate_precision"] == 1.0
    assert stats["loop_gate_recall"] == 1.0


def test_gate_errors_scored_against_gate_decisions():
    stamps, poses = _traj()
    T_gt = np.linalg.inv(poses[2]) @ poses[10]
    T_bad = T_gt.copy()
    T_bad[0, 3] += 2.0
    log = [
        # genuine rejected (recall miss) + aliased accepted (precision miss)
        _entry(int(stamps[2] * 1e6), int(stamps[10] * 1e6), T_gt, False),
        _entry(int(stamps[2] * 1e6), int(stamps[10] * 1e6), T_bad, True),
    ]
    stats = tag_loop_log(log, stamps, poses)
    assert stats["loop_gate_precision"] == 0.0
    assert stats["loop_gate_recall"] == 0.0
    # rotation error present on every tagged entry
    assert all("gt_rot_err_deg" in e for e in log)


def test_entries_outside_gt_coverage_are_skipped():
    stamps, poses = _traj(n=5)
    T = np.eye(4)
    log = [_entry(int(9.0 * 1e6), int(9.5 * 1e6), T, True),
           {"chi2_delta": 1.0, "accepted": True}]  # legacy entry, no kf keys
    stats = tag_loop_log(log, stamps, poses)
    assert stats["n_tagged"] == 0
    assert stats["loop_gate_precision"] is None
    assert "gt_error_m" not in log[0]
