"""The conditioning report must FAIL when text conditioning is ablated
(VERDICT r4 next #4): cross-class CD matrix + null-text control.

Uses stub generators over the synthetic classes so the metric itself is
under test — a "live" generator that returns clouds of the prompted class,
a "dead" one that returns the class marginal regardless of prompt, and a
"label-shuffled" one (live geometry, wrong class) that must also fail.
"""

import numpy as np
import jax

from nova_pointcloud_tpu.data.shapenet import make_synthetic_clouds
from nova_pointcloud_tpu.evaluation.pointcloud_eval import conditioning_report

N = 256


def _clouds():
    shapes = make_synthetic_clouds(30, N, seed=7)
    by = {}
    for s in shapes:
        by.setdefault(s["synset"], []).append(s["points"])
    return {k: np.stack(v).astype(np.float32) for k, v in by.items()}


def _pools():
    """Disjoint reference / generation pools per class."""
    by = _clouds()
    refs = {k: v[: len(v) // 2] for k, v in by.items()}
    gens = {k: v[len(v) // 2:] for k, v in by.items()}
    return refs, gens


def _report(generate_fn, refs):
    return conditioning_report(
        pipeline=None, refs_by_class=refs, num_points=N,
        samples_per_class=4, key=jax.random.PRNGKey(0),
        generate_fn=generate_fn)


def test_live_conditioning_passes():
    refs, gens = _pools()

    def live(prompts, key):
        out = []
        for p in prompts:
            cls = p[2:] if p.startswith("a ") else None
            if cls is None:  # null prompt -> class marginal (uncond sample)
                pool = np.concatenate(list(gens.values()))
            else:
                pool = gens[cls]
            out.append(pool[int(jax.random.randint(key, (), 0, len(pool)))])
            key = jax.random.split(key)[0]
        return np.stack(out)

    rep = _report(live, refs)
    assert rep["conditioning_accuracy"] == 1.0
    assert rep["class_separation"] > 0.02
    assert rep["null_degradation"] > 0
    assert rep["conditioned_ok"] is True


def test_dead_conditioning_fails():
    """Ablated text path: every prompt yields the class-marginal blend."""
    refs, gens = _pools()
    blend = np.concatenate(list(gens.values()))

    def dead(prompts, key):
        idx = np.asarray(jax.random.randint(key, (len(prompts),), 0,
                                            len(blend)))
        return blend[idx]

    rep = _report(dead, refs)
    # marginal == null generation: no degradation when text is dropped
    assert rep["null_degradation"] < 0.25 * max(rep["class_separation"], 1e-9)
    assert rep["conditioned_ok"] is False


def test_shuffled_conditioning_fails():
    """Live geometry routed to the WRONG class must fail the accuracy gate."""
    refs, gens = _pools()
    classes = sorted(gens)
    wrong = {c: gens[classes[(i + 1) % len(classes)]]
             for i, c in enumerate(classes)}

    def shuffled(prompts, key):
        out = []
        for p in prompts:
            pool = (np.concatenate(list(gens.values()))
                    if not p.startswith("a ") else wrong[p[2:]])
            out.append(pool[int(jax.random.randint(key, (), 0, len(pool)))])
            key = jax.random.split(key)[0]
        return np.stack(out)

    rep = _report(shuffled, refs)
    assert rep["conditioning_accuracy"] < 1.0
    assert rep["conditioned_ok"] is False
