"""Compatibility shims for jax bugs that affect this framework.

jax 0.9.0 jit fastpath mis-prunes arguments when the traced jaxpr carries
hoisted array constants: ``pjit._get_fastpath_data`` builds
``kept_var_bitvec`` over ``const_args + args_flat`` while
``executable._kept_var_idx`` indexes ``args_flat`` only.  On the next cached
call the runtime then supplies ``len(const_args)`` fewer buffers than the
compiled program expects ("Execution supplied N buffers but compiled program
expected M buffers").  The condition triggers whenever tracing picks up an
array constant — e.g. a module-level identity rotation, or a cached inner
trace from a previous eager execution.

The shim forces the (correct) python slow path whenever constants are
present, which only costs dispatch overhead in the rare const-carrying case.
Remove once upstream is fixed.
"""

from __future__ import annotations

_applied = False


def apply() -> None:
    global _applied
    if _applied:
        return
    _applied = True

    import jax

    if jax.__version__ != "0.9.0":
        return  # only known-broken version; don't touch others

    from jax._src import pjit as _pjit
    from jax._src.lib import xla_client as _xc

    _orig = _pjit._get_fastpath_data

    def _patched(executable, out_tree, args_flat, out_flat, effects,
                 consts_for_constvars, pgle_profiler, const_args):
        if const_args or consts_for_constvars:
            return None  # skip the miscounting fastpath; slow path is correct
        # hoisted constants can also ride inline in args_flat (as TypedNdArray
        # literals); subsequent fastpath calls then supply fewer buffers than
        # the executable expects
        if any(not isinstance(x, _xc.ArrayImpl) for x in args_flat):
            return None
        return _orig(executable, out_tree, args_flat, out_flat, effects,
                     consts_for_constvars, pgle_profiler, const_args)

    _pjit._get_fastpath_data = _patched
