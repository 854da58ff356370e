"""Pallas TPU kernels for the rasterization hot loops."""

import jax
from jax.experimental import pallas as pl


def out_struct(shape, dtype):
    """``jax.ShapeDtypeStruct`` for a ``pallas_call`` out_shape.

    Plain struct; :func:`pallas_call_vma` stamps the varying-mesh-axes on it
    at call time (from the actual operands), so kernels stay shared between
    sharded and unsharded paths.
    """
    return jax.ShapeDtypeStruct(shape, dtype)


def pallas_call_vma(kernel, *, out_shape, **kwargs):
    """``pl.pallas_call`` wrapper that propagates varying-mesh-axes (vma).

    Inside a ``shard_map`` with ``check_vma=True`` every kernel output must
    declare which manual mesh axes it varies over. A per-device kernel's
    outputs vary over exactly the union of its operands' varying axes (each
    device computes its own block from its own inputs — there is no
    cross-device communication in these kernels), which is the same
    inference rule jax applies to ordinary ops. Outside any shard_map the
    operands carry no vma and the out_shape passes through untouched.
    """

    def call(*args):
        vma = frozenset()
        for leaf in jax.tree.leaves(args):
            vma |= getattr(jax.typeof(leaf), "vma", None) or frozenset()
        osh = out_shape
        if vma:
            is_struct = lambda x: isinstance(x, jax.ShapeDtypeStruct)
            osh = jax.tree.map(
                lambda s: jax.ShapeDtypeStruct(s.shape, s.dtype, vma=vma) if is_struct(s) else s,
                out_shape,
                is_leaf=is_struct,
            )
        return pl.pallas_call(kernel, out_shape=osh, **kwargs)(*args)

    return call
