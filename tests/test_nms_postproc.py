"""NMS parity vs a direct transcription of the reference's greedy loop, plus
metrics tests."""
import numpy as np
import pytest

import jax.numpy as jnp

from zutis_tpu.engine.metrics import RunningScore, compute_iou
from zutis_tpu.ops.nms import mask_nms


def reference_nms(masks, scores, cats, thr=0.3, floor=0.001):
    """Host re-implementation of the reference hard-NMS semantics
    (networks/zutis.py:230-299) returning the kept (mask_idx) set."""
    kept = []
    for c in sorted(set(cats.tolist())):
        if c == 0:
            continue
        idx = np.flatnonzero(cats == c)
        cand = list(idx)
        cand_scores = {i: scores[i] for i in cand}
        while cand:
            best = max(cand, key=lambda i: cand_scores[i])
            kept.append(best)
            new_cand = []
            for i in cand:
                if i == best:
                    continue
                iou = compute_iou(masks[i], masks[best], threshold=None)
                w = 0.0 if iou > thr else 1.0
                s = cand_scores[i] * w
                if s > floor:
                    new_cand.append(i)
                    cand_scores[i] = s
            cand = new_cand
    return sorted(i for i in kept if masks[i].sum() > 0)


def test_hard_nms_matches_reference():
    rng = np.random.RandomState(0)
    q, h, w = 20, 16, 16
    for trial in range(5):
        masks = np.zeros((q, h, w), bool)
        for i in range(q):
            y, x = rng.randint(0, h - 6), rng.randint(0, w - 6)
            sz = rng.randint(3, 8)
            masks[i, y:y + sz, x:x + sz] = True
        scores = rng.rand(q).astype(np.float32)
        cats = rng.randint(0, 4, q)

        want = reference_nms(masks, scores, cats)
        keep, out_scores = mask_nms(
            jnp.asarray(masks), jnp.asarray(scores), jnp.asarray(cats)
        )
        got = sorted(np.flatnonzero(np.asarray(keep)).tolist())
        assert got == want, f"trial {trial}: {got} != {want}"
        # kept scores unchanged under hard NMS
        for i in got:
            np.testing.assert_allclose(np.asarray(out_scores)[i], scores[i])


def _nms_oracle(masks, scores, cats, nms_type, nms_threshold=0.3,
                sigma=0.5, floor=0.001):
    """The reference's per-category re-sort-every-round NMS
    (networks/zutis.py:211-299) in plain numpy."""
    kept = np.zeros(len(scores), bool)
    kept_scores = np.array(scores, np.float64)
    for cat in set(cats.tolist()):
        if cat == 0:
            continue
        idxs = [i for i in range(len(scores)) if cats[i] == cat
                and masks[i].sum() > 0]
        cand = {i: float(scores[i]) for i in idxs}
        while cand:
            best = max(cand, key=lambda i: cand[i])
            kept[best] = True
            kept_scores[best] = cand.pop(best)
            for i in list(cand):
                inter = np.logical_and(masks[i], masks[best]).sum()
                union = np.logical_or(masks[i], masks[best]).sum()
                iou = inter / union if union else 0.0
                if nms_type == "hard":
                    w = 0.0 if iou > nms_threshold else 1.0
                elif nms_type == "linear":
                    w = (1.0 - iou) if iou > nms_threshold else 1.0
                else:
                    w = float(np.exp(-(iou * iou) / sigma))
                cand[i] *= w
                if cand[i] <= floor:
                    del cand[i]
    return kept, kept_scores


@pytest.mark.parametrize("nms_type", ["hard", "linear", "gaussian"])
def test_all_nms_types_match_reference_resort_semantics(nms_type):
    """Soft NMS re-sorts candidates after every re-weighting round
    (reference zutis.py:245-266); selection order must follow the CURRENT
    scores, not the original ones."""
    rng = np.random.RandomState(7)
    q, H, W = 24, 24, 24
    masks = np.zeros((q, H, W), bool)
    for i in range(q):
        y, x = rng.randint(0, H - 10, 2)
        h, w = rng.randint(4, 12, 2)
        masks[i, y:y + h, x:x + w] = True
    masks[3] = False  # an empty mask: never kept
    scores = rng.uniform(0.001, 1.0, q).astype(np.float32)
    cats = rng.randint(0, 4, q).astype(np.int32)

    want_keep, want_scores = _nms_oracle(masks, scores, cats, nms_type)
    keep, out_scores = mask_nms(
        jnp.asarray(masks), jnp.asarray(scores), jnp.asarray(cats),
        nms_type=nms_type)
    np.testing.assert_array_equal(np.asarray(keep), want_keep)
    np.testing.assert_allclose(np.asarray(out_scores)[want_keep],
                               want_scores[want_keep], rtol=1e-5)


def test_below_floor_initial_score_is_still_selected():
    """A candidate whose ORIGINAL score is <= the 0.001 floor is still kept
    when it becomes its category's max: the reference floor-checks only after
    re-weighting (zutis.py:268-272), never on entry (ADVICE r2 repro)."""
    masks = np.zeros((2, 8, 8), bool)
    masks[0, :4, :4] = True
    masks[1, 4:, 4:] = True  # disjoint (IoU = 0)
    scores = np.array([0.5, 0.0005], np.float32)
    # different categories: mask 1 is never re-weighted, so it survives to
    # become category 2's max and is kept despite its below-floor score
    keep, out_scores = mask_nms(
        jnp.asarray(masks), jnp.asarray(scores),
        jnp.asarray([1, 2], dtype=np.int32))
    assert np.asarray(keep).tolist() == [True, True]
    np.testing.assert_allclose(np.asarray(out_scores), scores)
    # same category: after mask 0 is selected, mask 1 IS re-weighted (w=1.0
    # at IoU 0) and then floor-checked -> dropped (reference zutis.py:268-272)
    keep, _ = mask_nms(
        jnp.asarray(masks), jnp.asarray(scores),
        jnp.asarray([1, 1], dtype=np.int32))
    assert np.asarray(keep).tolist() == [True, False]


def test_running_score_matches_manual():
    rs = RunningScore(3)
    gt = np.array([[0, 1, 2, 1], [255, 0, 1, 2]])
    pred = np.array([[0, 1, 1, 1], [2, 0, 1, 0]])
    rs.update(gt, pred)
    # manual confusion (ignore 255): rows gt, cols pred
    want = np.zeros((3, 3))
    for g, p in zip(gt.ravel(), pred.ravel()):
        if 0 <= g < 3:
            want[g, p] += 1
    np.testing.assert_array_equal(rs.confusion_matrix, want)
    scores, cls_iu = rs.get_scores()
    acc = np.diag(want).sum() / want.sum()
    np.testing.assert_allclose(scores["Pixel Acc"], acc)


def test_compute_iou():
    a = np.zeros((4, 4)); a[:2] = 1
    b = np.zeros((4, 4)); b[1:3] = 1
    np.testing.assert_allclose(compute_iou(a, b, threshold=None), 4 / 12)
