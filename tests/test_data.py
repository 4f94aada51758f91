"""Data-layer tests: featurization, collate layout parity, cache, pipeline."""

import numpy as np
import pytest

from protein_redesign_tpu.chem import (
    mol_from_smiles,
    protein_from_sequence,
    update_mol_positions,
)
from protein_redesign_tpu.data import (
    collate_fn,
    ligand_to_data,
    load_complex_cache,
    pick_bucket,
    protein_to_data,
    save_complex_cache,
)
from protein_redesign_tpu.data.collate import numeric_batch
from protein_redesign_tpu.data.pipeline import batches, prefetch


def sample(n_res=5, smiles="CCO", seed=0):
    rng = np.random.RandomState(seed)
    mol = mol_from_smiles(smiles)
    mol = update_mol_positions(
        mol, rng.randn(mol.num_atoms(), 3).astype(np.float32)
    )
    prot = protein_from_sequence("ACDEFGHIKLMNPQRSTVWY"[:n_res])
    return {
        **ligand_to_data(mol),
        **protein_to_data(prot, esm_dim=8),
    }


class TestFeaturize:
    def test_ligand_tensors(self):
        d = sample()
        assert d["num_atoms"] == 3
        assert d["atom_feats"].shape == (3, 9)
        assert d["bond_feats"].shape == (3, 3, 3)
        # CCO: C-C and C-O bonds, symmetric
        assert d["bond_mask"][0, 1] == 1 and d["bond_mask"][1, 0] == 1
        assert d["bond_mask"][0, 2] == 0
        assert d["bond_distance"][0, 2] == 2

    def test_protein_tensors(self):
        d = sample(n_res=4)
        assert d["num_residues"] == 4
        assert d["residue_atom_pos"].shape == (4, 37, 3)
        assert d["residue_esm"].shape == (4, 8)


class TestCollate:
    def test_layout_atoms_then_residues(self):
        """Reference layout (`data.py:80-142`): atoms in [0, A), residues in
        [A, A+R), residue_type shifted +1."""
        d = sample(n_res=5)  # 3 atoms + 5 residues = 8 nodes
        batch = collate_fn([d], buckets=(16,))
        A = d["num_atoms"]
        assert batch["atom_mask"].shape == (1, 16)
        np.testing.assert_array_equal(
            batch["atom_mask"][0, :A], np.ones(A)
        )
        assert batch["atom_mask"][0, A:].sum() == 0
        np.testing.assert_array_equal(
            batch["residue_mask"][0, A: A + 5], np.ones(5)
        )
        assert batch["residue_mask"][0, :A].sum() == 0
        # +1 shift: 'A' (aatype 0) becomes class 1; padding stays 0.
        assert batch["residue_type"][0, A] == 1
        assert batch["residue_type"][0, 0] == 0
        assert batch["residue_type"][0, -1] == 0
        # bond tensors pad on both trailing complex axes
        assert batch["bond_feats"].shape == (1, 16, 16, 3)
        assert batch["bond_mask"].shape == (1, 16, 16)

    def test_mixed_sizes_pad_to_common_bucket(self):
        d1, d2 = sample(n_res=4), sample(n_res=12, smiles="c1ccccc1")
        batch = collate_fn([d1, d2], buckets=(8, 24, 48))
        assert batch["atom_mask"].shape == (2, 24)  # max(3+4, 6+12)=18 -> 24

    def test_x_mask_becomes_class_zero(self):
        prot = protein_from_sequence("AXC")
        d = {**sample(n_res=1), **protein_to_data(prot, esm_dim=8)}
        d["num_residues"] = 3
        batch = collate_fn([d], buckets=(8,))
        A = d["num_atoms"]
        # X has aatype -1 -> shifted to 0 (the mask class)
        assert batch["residue_type"][0, A + 1] == 0
        assert batch["residue_type"][0, A] == 1  # 'A'

    def test_pick_bucket(self):
        assert pick_bucket(5, (8, 16)) == 8
        assert pick_bucket(8, (8, 16)) == 8
        assert pick_bucket(9, (8, 16)) == 16
        with pytest.raises(ValueError):
            pick_bucket(17, (8, 16))

    def test_mol_fields_stay_python(self):
        d = sample()
        batch = collate_fn([d, d], buckets=(16,))
        assert isinstance(batch["ligand_mol"], list)
        assert "ligand_mol" not in numeric_batch(batch)


class TestCache:
    def test_roundtrip(self, tmp_path):
        d = sample()
        save_complex_cache(tmp_path, "1abc", d)
        loaded = load_complex_cache(tmp_path, "1abc")
        assert loaded["num_atoms"] == 3
        np.testing.assert_allclose(loaded["atom_pos"], d["atom_pos"])
        np.testing.assert_array_equal(loaded["residue_type"],
                                      d["residue_type"])
        with_mols = load_complex_cache(tmp_path, "1abc", with_mols=True)
        assert with_mols["ligand_mol"].num_atoms() == 3


class TestPipeline:
    def _ds(self):
        class DS:
            def __len__(self):
                return 5

            def __getitem__(self, i):
                return sample(n_res=4 + i, seed=i)

        return DS()

    def test_batches_shapes(self):
        out = list(batches(self._ds(), 2, (16, 32)))
        assert len(out) == 3  # 5 samples, last padded by repetition
        assert all(b["atom_mask"].shape[0] == 2 for b in out)

    def test_accum_reshape(self):
        out = list(batches(self._ds(), 1, (16, 32), accum=2))
        assert out[0]["atom_mask"].shape[:2] == (2, 1)

    def test_fixed_bucket_pins_every_batch_shape(self):
        # Multi-host training requires one static shape per global step
        # regardless of which samples land in each host's stride.
        out = list(batches(self._ds(), 2, (16, 32), fixed_bucket=32))
        assert all(b["atom_mask"].shape == (2, 32) for b in out)
        assert all(b["bond_mask"].shape == (2, 32, 32) for b in out)

    def test_prefetch_preserves_order_and_errors(self):
        items = list(prefetch(iter(range(10)), size=3))
        assert items == list(range(10))

        def bad():
            yield 1
            raise RuntimeError("boom")

        it = prefetch(bad(), size=2)
        assert next(it) == 1
        with pytest.raises(RuntimeError):
            list(it)

    def test_pick_bucket_unsorted_ladder(self):
        # first-fit on an unsorted ladder would silently over-pad 16x
        assert pick_bucket(50, (1024, 64, 256)) == 64
        assert pick_bucket(65, (1024, 64, 256)) == 256

    def test_prefetch_slow_consumer_terminates_and_sees_errors(self):
        # At iterator exhaustion the queue can be FULL because the
        # consumer is merely slow (not gone): the sentinel must block-put
        # like items do. A dropped sentinel left the consumer in q.get()
        # forever after draining the buffer, and swallowed worker
        # exceptions (the train loop consumes prefetch(..., size=2)).
        import threading
        import time

        results = {}

        def consume(name, gen):
            try:
                out = []
                for x in gen:
                    out.append(x)
                    time.sleep(0.05)  # slower than the producer
                results[name] = out
            except Exception as e:
                results[name] = e

        def bad():
            yield 1
            yield 2
            raise RuntimeError("boom")

        threads = [
            threading.Thread(
                target=consume, args=("ok", prefetch(iter(range(5)), size=2)),
                daemon=True,
            ),
            threading.Thread(
                target=consume, args=("err", prefetch(bad(), size=1)),
                daemon=True,
            ),
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=10.0)
        assert not any(t.is_alive() for t in threads), \
            "prefetch consumer hung (sentinel dropped on full queue)"
        assert results["ok"] == list(range(5))
        assert isinstance(results["err"], RuntimeError)

    def test_prefetch_worker_exits_on_early_abandon(self):
        # A consumer that stops iterating (max_steps / SIGTERM) must not
        # leave the worker blocked on q.put forever, pinning buffered
        # (possibly device-resident) batches.
        import threading
        import time

        before = threading.active_count()
        it = prefetch(iter(range(1000)), size=1)
        assert next(it) == 0
        it.close()  # what a `break` out of a for-loop triggers
        deadline = time.time() + 5.0
        while threading.active_count() > before and time.time() < deadline:
            time.sleep(0.05)
        assert threading.active_count() <= before, "worker thread leaked"


class TestEpochSharding:
    """Per-host data sharding (DistributedSampler semantics) for
    multi-host training (VERDICT round-1 item #10)."""

    def _ds(self, n):
        return [{"i": i} for i in range(n)]

    def test_shards_partition_the_epoch(self):
        from protein_redesign_tpu.data.dataset import iterate_batches

        ds = self._ds(13)
        seen = []
        for shard in range(4):
            for batch in iterate_batches(
                ds, 2, shuffle=True, seed=3, epoch=1,
                num_shards=4, shard_index=shard,
            ):
                seen.extend(s["i"] for s in batch)
        # Wrap-padding: 13 -> 16 items, 4 per shard; every index covered.
        assert len(seen) == 16
        assert set(seen) == set(range(13))

    def test_shards_equal_length_and_disjoint_without_padding(self):
        from protein_redesign_tpu.data.dataset import iterate_batches

        ds = self._ds(12)
        shards = []
        for shard in range(3):
            items = []
            for batch in iterate_batches(
                ds, 2, shuffle=True, seed=0, num_shards=3, shard_index=shard,
            ):
                items.extend(s["i"] for s in batch)
            shards.append(items)
        assert all(len(s) == 4 for s in shards)
        combined = sum(shards, [])
        assert sorted(combined) == list(range(12))  # disjoint cover

    def test_same_permutation_across_processes(self):
        """Every host must derive the same global order from (seed, epoch)
        so the strided slices are consistent."""
        from protein_redesign_tpu.data.dataset import iterate_batches

        ds = self._ds(10)
        a = [s["i"] for b in iterate_batches(
            ds, 10, shuffle=True, seed=7, epoch=2) for s in b]
        b = [s["i"] for b in iterate_batches(
            ds, 10, shuffle=True, seed=7, epoch=2) for s in b]
        assert a == b

    def test_single_shard_unchanged(self):
        from protein_redesign_tpu.data.dataset import iterate_batches

        ds = self._ds(5)
        out = [s["i"] for b in iterate_batches(ds, 2) for s in b]
        assert out == [0, 1, 2, 3, 4]
