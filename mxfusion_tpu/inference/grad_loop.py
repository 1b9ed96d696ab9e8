"""Abstract gradient loop.

Reference: /root/reference/mxfusion/inference/grad_loop.py:19-45.
"""
from abc import ABC, abstractmethod

import jax


class TrainState:
    """Loop-internal optimizer state for DETERMINISTIC resume.

    Captures everything the loop threads between iterations besides the
    parameters themselves: the flattened optax optimizer state leaves
    (adam moments + step count), the carried PRNG key, and the step
    index. A run resumed from a ``TrainState`` reproduces the
    uninterrupted run's trajectory exactly (same key-split sequence,
    same optimizer moments) — asserted to ~1e-12 by
    tests/inference/test_crash_resume.py.

    The optax state is stored as FLATTENED LEAVES: restoring requires
    rebuilding the same optimizer (same ``optimizer``/``learning_rate``
    arguments), whose ``opt.init`` supplies the treedef. The reference
    has no mid-training state capture at all (its save covers finished
    runs only, /root/reference/mxfusion/inference/inference.py:255-310).
    """

    def __init__(self, step=0, key=None, opt_leaves=None):
        self.step = step
        self.key = key
        self.opt_leaves = opt_leaves

    # -- deprecation shims: load_params returned a bare int step before
    # 0.4.0; legacy callers doing `step = load_params(...)` then integer
    # comparison/arithmetic must fail LOUDLY (a TrainState is always
    # truthy, so silent misbehavior is the alternative).
    def __int__(self):
        import warnings
        warnings.warn(
            "load_params now returns a TrainState (0.4.0), not the int "
            "step; use `.step` (and pass the state as resume_state= to "
            "resume deterministically).", DeprecationWarning,
            stacklevel=2)
        return int(self.step)

    def __eq__(self, other):
        # bool is an int subclass but `state == True` is a truthiness
        # idiom, not a legacy step comparison — leave it to the default
        # (identity) semantics rather than warn spuriously
        import numbers
        if (isinstance(other, numbers.Number)
                and not isinstance(other, bool)):
            # numbers.Number also admits np.int64/np.float64 steps —
            # a numpy comparand falling through to NotImplemented
            # would silently compare False, the exact failure mode
            # this shim exists to make loud
            import warnings
            warnings.warn(
                "comparing a TrainState to a number: load_params "
                "returns a TrainState since 0.4.0 — compare against "
                "`.step` instead.", DeprecationWarning, stacklevel=2)
            return self.step == other
        return NotImplemented

    # identity hash: strictly this breaks the eq/hash contract for the
    # deprecated number comparison above (st == 500 without equal
    # hashes) — accepted for a transition shim; TrainStates are not
    # meant to be set/dict keys alongside ints, and the comparison
    # itself already warns
    __hash__ = object.__hash__

    def restore_opt_state(self, template_opt_state):
        """Unflatten the saved leaves into ``template_opt_state``'s
        structure (from a fresh ``opt.init(trainable)``)."""
        import jax.numpy as jnp
        if self.opt_leaves is None:
            return template_opt_state
        treedef = jax.tree_util.tree_structure(template_opt_state)
        tmpl = jax.tree_util.tree_leaves(template_opt_state)
        if len(tmpl) != len(self.opt_leaves):
            raise ValueError(
                "TrainState holds {} optimizer-state leaves but the "
                "loop's optimizer has {} — resume must rebuild the same "
                "optimizer (same optimizer= and learning_rate=) it was "
                "checkpointed with.".format(len(self.opt_leaves),
                                            len(tmpl)))
        leaves = []
        for i, (l, t) in enumerate(zip(self.opt_leaves, tmpl)):
            l = jnp.asarray(l, dtype=t.dtype)
            if tuple(l.shape) != tuple(t.shape):
                raise ValueError(
                    "TrainState optimizer-state leaf {} has shape {} "
                    "but the loop's optimizer expects {} — the "
                    "checkpoint belongs to a different model/optimizer "
                    "configuration.".format(i, tuple(l.shape),
                                            tuple(t.shape)))
            leaves.append(l)
        return jax.tree_util.tree_unflatten(treedef, leaves)


class GradLoop(ABC):
    @staticmethod
    def _sync_live_state(params, trainable, fixed, opt_state=None,
                         key=None, step=None):
        """Write the loop's current trainable/fixed state back into the
        parameter store so callbacks (e.g. CheckpointCallback) observe
        live values rather than the values from loop entry. When the
        loop also passes its optimizer state / PRNG key / step, they are
        published as ``params.train_state`` so checkpoints capture the
        FULL resume state (leaves stay on device; host copies happen
        only at save time)."""
        params.update_params(trainable)
        params.update_params(fixed)
        if opt_state is not None:
            params.train_state = TrainState(
                step=step, key=key,
                opt_leaves=jax.tree_util.tree_leaves(opt_state))

    @abstractmethod
    def run(self, executor, params, data, optimizer="adam",
            learning_rate=1e-3, max_iter=1000, key=None, verbose=False,
            callback=None, mesh=None):
        """Run the optimization loop; returns the final loss."""
