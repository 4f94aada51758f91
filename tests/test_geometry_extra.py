"""Coverage for the remaining geometry utilities (nearest_bin, pseudo_beta
— imported by the reference at `model.py:45-46` though unused there)."""

import numpy as np

import jax.numpy as jnp

from protein_redesign_tpu.ops.geometry import nearest_bin, pseudo_beta


class TestNearestBin:
    def test_bins(self):
        x = jnp.asarray([0.0, 0.24, 0.26, 0.99, 1.0])
        idx = nearest_bin(x, bins=2, min_val=0.0, max_val=1.0)
        # centers at 0.25 and 0.75
        np.testing.assert_array_equal(np.asarray(idx), [0, 0, 0, 1, 1])

    def test_out_of_range_clamps_to_edges(self):
        x = jnp.asarray([-5.0, 5.0])
        idx = nearest_bin(x, bins=4, min_val=0.0, max_val=1.0)
        np.testing.assert_array_equal(np.asarray(idx), [0, 3])


class TestPseudoBeta:
    def test_glycine_like_geometry(self):
        # One residue with N/CA/C placed in a plane.
        pos = np.zeros((1, 1, 37, 3), np.float32)
        pos[0, 0, 0] = [-1.46, 0.0, 0.0]   # N
        pos[0, 0, 1] = [0.0, 0.0, 0.0]     # CA
        pos[0, 0, 2] = [0.87, 1.21, 0.0]   # C
        mask = np.zeros((1, 1, 37), np.float32)
        mask[0, 0, :3] = 1.0
        cb, cb_mask = pseudo_beta(jnp.asarray(pos), jnp.asarray(mask))
        assert cb.shape == (1, 1, 3)
        assert float(cb_mask[0, 0]) == 1.0
        # Pseudo-CB sits ~1.5 A from CA, out of the N-CA-C plane.
        d = np.linalg.norm(np.asarray(cb[0, 0]))
        assert 1.0 < d < 2.2
        assert abs(float(cb[0, 0, 2])) > 0.1

    def test_missing_backbone_masks_out(self):
        pos = np.zeros((1, 1, 37, 3), np.float32)
        mask = np.zeros((1, 1, 37), np.float32)
        mask[0, 0, 1] = 1.0  # CA only
        _, cb_mask = pseudo_beta(jnp.asarray(pos), jnp.asarray(mask))
        assert float(cb_mask[0, 0]) == 0.0
