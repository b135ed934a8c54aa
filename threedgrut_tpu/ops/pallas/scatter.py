"""Row scatter-accumulate Pallas kernel.

Accumulates per-pair gradient rows into a per-particle table held in VMEM
(TPU grids execute sequentially, so the accumulator is race-free). This
replaces XLA's scatter-add lowering (~20 ms for 1M x 16 rows on v5e) for
capacities whose table fits on chip; the raster backward's d_records
gather-transpose becomes one streaming pass.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CHUNK = 128


def _scatter_kernel(d_rec_ref, ids_ref, out_ref, acc, buf, out_sem, *,
                    n_rows: int):
    i = pl.program_id(0)
    n = pl.num_programs(0)

    @pl.when(i == 0)
    def _():
        acc[:, :] = jnp.zeros_like(acc)

    buf[:, :] = jnp.transpose(d_rec_ref[0])      # [CHUNK, R]

    def body(j, _):
        idx = ids_ref[0, 0, j]
        acc[pl.ds(idx, 1), :] = acc[pl.ds(idx, 1), :] + buf[pl.ds(j, 1), :]
        return 0

    jax.lax.fori_loop(0, CHUNK, body, 0)

    @pl.when(i == n - 1)
    def _():
        dma = pltpu.make_async_copy(acc, out_ref, out_sem)
        dma.start()
        dma.wait()


def scatter_accumulate_rows(d_records: jnp.ndarray, ids: jnp.ndarray,
                            n_rows: int, interpret: bool = False):
    """sum_j d_records[j] into rows ids[j] -> [n_rows, R].

    d_records: [C, R, CHUNK] chunked rows; ids: [C, CHUNK] int32 row ids
    (rows whose d_records are all-zero may carry any valid id).
    """
    c, r, _ = d_records.shape
    ids = ids.reshape(c, 1, CHUNK)
    return pl.pallas_call(
        functools.partial(_scatter_kernel, n_rows=n_rows),
        grid=(c,),
        in_specs=[
            pl.BlockSpec((1, r, CHUNK), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, CHUNK), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((n_rows, r), jnp.float32),
            pltpu.VMEM((CHUNK, r), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        out_shape=jax.ShapeDtypeStruct((n_rows, r), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(d_records, ids)
