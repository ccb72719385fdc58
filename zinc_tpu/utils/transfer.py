"""Transfer forcing for tunneled devices.

Two axon-tunnel facts shape this module (CLAUDE.md; measured r4):

* ``jax.block_until_ready`` does NOT actually wait over the tunnel — the
  only reliable barrier is fetching bytes (``np.asarray``).
* An executable whose operand uploads were merely *dispatched*
  (``jax.device_put`` is async) pulls them LAZILY at execute time through
  a chunked, sync-per-chunk path: at 2^20 the Spartan setup waited
  **839 s** for ~500 MB of CSR operands that an eager forced transfer
  moves in **27 s** (31×; the per-chunk ~33 ms tunnel sync floor).

``force_transfers`` makes every listed array device-resident NOW: one
tiny-reduction fetch per array keeps each wait on the bulk device_put
path.  It is a no-op-cost barrier on directly-attached hardware.
"""

from __future__ import annotations

import numpy as np


def force_transfers(arrays) -> None:
    """Block until every array in ``arrays`` is resident on its device.

    Each array pays one ~33 ms tunnel sync (the tiny reduction fetch);
    callers should pass the handful of LARGE operands, not thousands of
    small ones."""
    import jax
    import jax.numpy as jnp

    for a in arrays:
        if a is None:
            continue
        # a 1-element reduction: waits for THIS array's transfer without
        # downloading it (slicing alone lets XLA skip the wait)
        np.asarray(jnp.sum(jax.lax.slice(a, (0,) * a.ndim, (1,) * a.ndim)))


def csr_arrays(matrices) -> list:
    """The transferable arrays of a list of DeviceCsr uploads."""
    out = []
    for m in matrices:
        out += [m.vals, m.cols_idx, m.rows_idx, m.row_ends,
                m.vals_by_col, m.rows_by_col, m.col_ends]
    return out
