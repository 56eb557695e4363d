"""On-device (XLA) inference for sklearn tree ensembles.

The reference serves its classical baselines through sklearn's Python
``predict_proba`` on host (Codes/10_test_hybrid_pipeline.py:305-316), forcing a
device->host round-trip inside the hybrid pipeline. Here the fitted trees are
exported once into dense node arrays and evaluated fully on-device:

- every tree becomes (feature, threshold, left, right, leaf_value) arrays padded
  to the ensemble's max node count;
- a sample descends via ``depth`` iterations of a gather + ``jnp.where`` (no
  data-dependent control flow — jit/vmap/shard_map friendly);
- the whole ensemble evaluates as one vmap over trees, batched over samples.

Supports DecisionTreeClassifier, RandomForestClassifier (prob = mean of
per-tree class distributions) and GradientBoostingClassifier /
HistGradientBoostingClassifier (sigmoid over summed leaf scores, binary).
Training stays on sklearn (seconds on 76-dim features — not a TPU workload);
this is a serving-path optimization, exact to float tolerance.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class TreeEnsemble(NamedTuple):
    feature: jax.Array     # (n_trees, max_nodes) int32; -1 => leaf
    threshold: jax.Array   # (n_trees, max_nodes) f32
    left: jax.Array        # (n_trees, max_nodes) int32
    right: jax.Array       # (n_trees, max_nodes) int32
    value: jax.Array       # (n_trees, max_nodes, n_out) f32 (class probs or score)
    missing_left: jax.Array  # (n_trees, max_nodes) bool: NaN feature goes left
    depth: int             # max tree depth (static iteration bound)
    kind: str              # "prob" (average probs) | "raw" (sum scores -> sigmoid)
    base_score: float      # additive offset for "raw" ensembles


def _export_sklearn_tree(tree, n_out: int, normalize: bool) -> tuple:
    t = tree.tree_
    n = t.node_count
    feat = t.feature.astype(np.int32)           # -2 for leaves in sklearn
    feat = np.where(feat < 0, -1, feat).astype(np.int32)
    thr = t.threshold.astype(np.float32)
    left = t.children_left.astype(np.int32)
    right = t.children_right.astype(np.int32)
    val = t.value.reshape(n, -1).astype(np.float64)
    if normalize:  # classifier counts -> class probabilities
        s = val.sum(axis=1, keepdims=True)
        val = val / np.where(s > 0, s, 1.0)
    if val.shape[1] != n_out:
        raise ValueError(f"tree value width {val.shape[1]} != {n_out}")
    # sklearn >= 1.3 trees route NaN per-node (native missing support);
    # older trees never see NaN (imputed pipelines) -> all-False is exact
    ml = getattr(t, "missing_go_to_left", None)
    ml = (np.zeros(n, bool) if ml is None
          else np.asarray(ml, bool)[:n])
    depth = int(t.max_depth)
    return feat, thr, left, right, val.astype(np.float32), ml, depth


def _pad_stack(arrs, fill):
    m = max(a.shape[0] for a in arrs)
    out = np.full((len(arrs), m) + arrs[0].shape[1:], fill, arrs[0].dtype)
    for i, a in enumerate(arrs):
        out[i, : a.shape[0]] = a
    return out


def export_ensemble(model) -> TreeEnsemble:
    """Convert a fitted sklearn tree model/ensemble into device arrays.

    Accepts DecisionTreeClassifier, RandomForestClassifier,
    GradientBoostingClassifier, HistGradientBoostingClassifier, or a Pipeline
    whose final step is one of those (the pipeline's imputer/scaler must be
    applied to features beforehand with ``transform_features``).
    """
    from sklearn.ensemble import (
        GradientBoostingClassifier,
        HistGradientBoostingClassifier,
        RandomForestClassifier,
    )
    from sklearn.pipeline import Pipeline
    from sklearn.tree import DecisionTreeClassifier

    if isinstance(model, Pipeline):
        model = model.steps[-1][1]

    if isinstance(model, DecisionTreeClassifier):
        trees = [_export_sklearn_tree(model, len(model.classes_), True)]
        kind, base = "prob", 0.0
    elif isinstance(model, RandomForestClassifier):
        trees = [_export_sklearn_tree(e, len(model.classes_), True)
                 for e in model.estimators_]
        kind, base = "prob", 0.0
    elif isinstance(model, GradientBoostingClassifier):
        if len(model.classes_) != 2:
            raise NotImplementedError("binary GB only")
        trees = [_export_sklearn_tree(e, 1, False)
                 for e in model.estimators_[:, 0]]
        # sklearn GB binary: raw = init + lr * sum(tree outputs)
        kind = "raw"
        base = float(model._raw_predict_init(np.zeros((1, model.n_features_in_))))
        trees = [(f, t, l, r, v * model.learning_rate, m, d)
                 for (f, t, l, r, v, m, d) in trees]
    elif isinstance(model, HistGradientBoostingClassifier):
        if len(model.classes_) != 2:
            raise NotImplementedError("binary HGB only")
        trees = []
        for preds in model._predictors:
            p = preds[0]
            nodes = p.nodes
            feat = np.where(nodes["is_leaf"], -1,
                            nodes["feature_idx"]).astype(np.int32)
            thr = nodes["num_threshold"].astype(np.float32)
            left = nodes["left"].astype(np.int32)
            right = nodes["right"].astype(np.int32)
            val = nodes["value"].astype(np.float32)[:, None]
            # HGB handles NaN natively (no imputer in the zoo for it) and
            # records the per-node NaN direction — sklearn parity requires
            # honoring it (a bare `fv <= thr` sends every NaN right)
            ml = nodes["missing_go_to_left"].astype(bool)
            depth = int(nodes["depth"].max()) + 1
            trees.append((feat, thr, left, right, val, ml, depth))
        kind = "raw"
        base = float(model._baseline_prediction.ravel()[0])
    else:
        raise TypeError(f"unsupported model type {type(model)}")

    feat = _pad_stack([t[0] for t in trees], -1)
    thr = _pad_stack([t[1] for t in trees], 0.0)
    left = _pad_stack([t[2] for t in trees], 0)
    right = _pad_stack([t[3] for t in trees], 0)
    val = _pad_stack([t[4] for t in trees], 0.0)
    ml = _pad_stack([t[5] for t in trees], False)
    depth = max(t[6] for t in trees)
    return TreeEnsemble(
        feature=jnp.asarray(feat), threshold=jnp.asarray(thr),
        left=jnp.asarray(left), right=jnp.asarray(right),
        value=jnp.asarray(val), missing_left=jnp.asarray(ml),
        depth=depth, kind=kind, base_score=base,
    )


def transform_features(pipeline, X: np.ndarray) -> np.ndarray:
    """Apply a sklearn Pipeline's preprocessing (all but the final estimator)."""
    from sklearn.pipeline import Pipeline

    if not isinstance(pipeline, Pipeline):
        return X
    out = X
    for _, step in pipeline.steps[:-1]:
        out = step.transform(out)
    return np.asarray(out, np.float32)


def ensemble_predict_proba(ens: TreeEnsemble, X: jax.Array) -> jax.Array:
    """p(class 1) for each row of X (N, F), fully on-device.

    Descends every tree with ``depth`` gather steps; padded/leaf nodes are
    self-absorbing (feature == -1 keeps the node index fixed).
    """
    X = jnp.asarray(X, jnp.float32)

    def one_tree(feat, thr, left, right, val, ml):
        def descend(x):
            def body(_, node):
                f = feat[node]
                is_leaf = f < 0
                fv = x[jnp.maximum(f, 0)]
                go_left = jnp.where(jnp.isnan(fv), ml[node], fv <= thr[node])
                nxt = jnp.where(go_left, left[node], right[node])
                return jnp.where(is_leaf, node, nxt)

            node = jax.lax.fori_loop(0, ens.depth, body, jnp.int32(0))
            return val[node]

        return jax.vmap(descend)(X)                 # (N, n_out)

    per_tree = jax.vmap(one_tree)(ens.feature, ens.threshold, ens.left,
                                  ens.right, ens.value,
                                  ens.missing_left)   # (T, N, n_out)
    if ens.kind == "prob":
        probs = per_tree.mean(axis=0)               # (N, n_classes)
        return probs[:, 1]
    raw = per_tree[:, :, 0].sum(axis=0) + ens.base_score
    return jax.nn.sigmoid(raw)


__all__ = ["TreeEnsemble", "export_ensemble", "transform_features",
           "ensemble_predict_proba"]
