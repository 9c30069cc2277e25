import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
t0=time.monotonic()
import jax, numpy as np
from sparse_matrix_with_flops_tpu.utils.generate import banded_csr
from sparse_matrix_with_flops_tpu.ops.block_spgemm import plan_block, block_spgemm_tiled, block_fill_estimate
print("import", time.monotonic()-t0)
a = banded_csr(62451, bandwidth=32)
print("gen", time.monotonic()-t0)
t=time.monotonic(); fill = block_fill_estimate(a,a); print("fill", fill, time.monotonic()-t)
t=time.monotonic(); plan = plan_block(a,a); print("plan", time.monotonic()-t, "pairs", plan.pair_a.size, "n_cblk", plan.n_cblk, "kmax", plan.kmax, "n_ablk", plan.n_ablk)
da = jax.device_put(a)
t=time.monotonic(); out = block_spgemm_tiled(da,da,plan); jax.block_until_ready(out.flat_val); print("tiled warm1", time.monotonic()-t)
t=time.monotonic(); out = block_spgemm_tiled(da,da,plan); jax.block_until_ready(out.flat_val); print("tiled warm2", time.monotonic()-t)
t=time.monotonic(); csr = out.to_csr(); jax.block_until_ready(csr.values); print("to_csr", time.monotonic()-t)
print("nnzc", int(np.asarray(csr.row_ptr)[-1]))
