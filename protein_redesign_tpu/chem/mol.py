"""Dependency-free small-molecule representation and I/O.

Replaces the reference's RDKit usage (`/root/reference/ProteinReDiff/mol.py`,
`features.py`, `data.py:45`) with a self-contained implementation:

- ``Molecule``: atoms, bonds, a single conformer, perception of rings,
  aromaticity, implicit hydrogens, hybridization, and conjugation.
- Parsers: SDF (V2000), MOL2 (TRIPOS), SMILES (see ``smiles.py``).
- Writers: SDF (V2000).
- ``standardize_mol``: perception + heavy-atom extraction, mirroring the
  reference's ``Chem.SanitizeMol`` + ``Chem.RemoveHs``
  (`mol.py:26-34`).
- ``Molecule.distance_matrix``: BFS topological distances, mirroring
  ``Chem.GetDistanceMatrix`` (`data.py:45`).

Perception follows RDKit's default models where they are well-defined
(Hückel 4n+2 electron counting over rings and fused ring systems, orbital-
count hybridization, setConjugation, Kekulé serialization, 3D stereo
assignment); bit-exact RDKit parity is impossible without RDKit, which is
intentionally not a dependency of this framework — known divergences are
documented in docs/PARITY.md.
"""

from __future__ import annotations

import dataclasses
from collections import deque
from pathlib import Path
from typing import Dict, List, Optional, Sequence, Tuple, Union

import numpy as np

from .elements import (
    AROMATIC_CANDIDATES,
    ATOMIC_NUM,
    DEFAULT_VALENCES,
    N_OUTER_ELECS,
    symbol_of,
)

BOND_ORDER_SINGLE = 1
BOND_ORDER_DOUBLE = 2
BOND_ORDER_TRIPLE = 3
BOND_ORDER_AROMATIC = 4  # SDF/MOL2 aromatic type


@dataclasses.dataclass
class Atom:
    atomic_num: int
    formal_charge: int = 0
    chirality: str = "CHI_UNSPECIFIED"
    is_aromatic: bool = False
    num_explicit_hs: Optional[int] = None  # set → disables implicit-H calc
    num_radical_electrons: int = 0
    # Derived during perception:
    num_implicit_hs: int = 0
    is_in_ring: bool = False
    hybridization: str = "SP3"

    @property
    def symbol(self) -> str:
        return symbol_of(self.atomic_num)


@dataclasses.dataclass
class Bond:
    a1: int
    a2: int
    order: int = BOND_ORDER_SINGLE
    is_aromatic: bool = False
    stereo: str = "STEREONONE"
    # SMILES directional marker as written a1->a2: +1 '/', -1 '\', 0 none
    direction: int = 0
    # Derived during perception:
    is_in_ring: bool = False
    is_conjugated: bool = False

    @property
    def type_name(self) -> str:
        if self.is_aromatic or self.order == BOND_ORDER_AROMATIC:
            return "AROMATIC"
        return {1: "SINGLE", 2: "DOUBLE", 3: "TRIPLE"}.get(self.order, "misc")

    def other(self, idx: int) -> int:
        return self.a2 if idx == self.a1 else self.a1

    def value(self) -> float:
        """Bond-order contribution to valence (aromatic counts 1.5)."""
        if self.is_aromatic or self.order == BOND_ORDER_AROMATIC:
            return 1.5
        return float(self.order)


class Molecule:
    """A small molecule with one optional conformer.

    The attribute/method surface deliberately shadows the subset of the
    RDKit ``Chem.Mol`` API the reference uses, so featurization code reads
    the same way.
    """

    def __init__(
        self,
        atoms: Sequence[Atom],
        bonds: Sequence[Bond],
        positions: Optional[np.ndarray] = None,
        name: str = "",
    ):
        self.atoms: List[Atom] = list(atoms)
        self.bonds: List[Bond] = list(bonds)
        self.positions: Optional[np.ndarray] = (
            None if positions is None else np.asarray(positions, dtype=np.float32)
        )
        self.name = name
        self._adj: Optional[List[List[int]]] = None  # atom -> bond indices
        self._bond_lookup: Optional[Dict[Tuple[int, int], int]] = None

    # ------------------------------------------------------------------ basic
    def num_atoms(self) -> int:
        return len(self.atoms)

    def num_bonds(self) -> int:
        return len(self.bonds)

    def adjacency(self) -> List[List[int]]:
        if self._adj is None:
            adj: List[List[int]] = [[] for _ in self.atoms]
            for bi, b in enumerate(self.bonds):
                adj[b.a1].append(bi)
                adj[b.a2].append(bi)
            self._adj = adj
        return self._adj

    def bond_between(self, i: int, j: int) -> Optional[Bond]:
        if self._bond_lookup is None:
            self._bond_lookup = {}
            for bi, b in enumerate(self.bonds):
                self._bond_lookup[(b.a1, b.a2)] = bi
                self._bond_lookup[(b.a2, b.a1)] = bi
        bi = self._bond_lookup.get((i, j))
        return None if bi is None else self.bonds[bi]

    def neighbors(self, i: int) -> List[int]:
        return [self.bonds[bi].other(i) for bi in self.adjacency()[i]]

    def degree(self, i: int) -> int:
        """Heavy+explicit-H graph degree (bonded neighbors in the graph)."""
        return len(self.adjacency()[i])

    def total_degree(self, i: int) -> int:
        """Degree including implicit hydrogens (RDKit ``GetTotalDegree``)."""
        return self.degree(i) + self.atoms[i].num_implicit_hs

    def total_num_hs(self, i: int) -> int:
        """Implicit + graph-bonded hydrogens (RDKit ``GetTotalNumHs``)."""
        nh = self.atoms[i].num_implicit_hs
        for j in self.neighbors(i):
            if self.atoms[j].atomic_num == 1:
                nh += 1
        return nh

    def _invalidate(self) -> None:
        self._adj = None
        self._bond_lookup = None

    # ------------------------------------------------------------- perception
    def perceive(self) -> "Molecule":
        """Run ring/aromaticity/valence/hybridization/conjugation perception."""
        self._perceive_rings()
        self._perceive_aromaticity()
        self._assign_implicit_hs()
        self._assign_hybridization()
        self._assign_conjugation()
        self._perceive_double_bond_stereo()
        return self

    def _perceive_double_bond_stereo(self) -> None:
        """E/Z from SMILES directional bonds (RDKit's STEREOE/STEREOZ
        assignment the reference featurizer reads, `features.py:95-103`).

        For a double bond a=b flanked by directional single bonds
        (x-a) and (b-y), read both directions in x->a / b->y
        orientation (flipping a marker recorded against that
        orientation): equal signs = trans (STEREOE), opposite =
        cis (STEREOZ). F/C=C/F -> E; F/C=C\\F -> Z; C(/F)=C/F -> Z."""
        adj = self.adjacency()

        def oriented_dir(end: int, toward_end: bool, skip: "Bond") -> int:
            for bi in adj[end]:
                nb = self.bonds[bi]
                if nb is skip or nb.direction == 0:
                    continue
                d = nb.direction
                if toward_end and nb.a2 != end:
                    d = -d  # recorded end->x; want x->end
                if not toward_end and nb.a1 != end:
                    d = -d  # recorded y->end; want end->y
                return d
            return 0

        for b in self.bonds:
            if b.order != BOND_ORDER_DOUBLE or b.is_aromatic:
                continue
            da = oriented_dir(b.a1, True, b)
            db = oriented_dir(b.a2, False, b)
            if da and db:
                b.stereo = "STEREOE" if da == db else "STEREOZ"

    def canonical_ranks(self) -> List[int]:
        """Weisfeiler-Lehman refinement ranks: atoms with equal rank are
        graph-equivalent under (element, charge, H count, degree, bond
        orders). Used to exclude non-stereogenic centers from 3D stereo
        perception (RDKit's ``AssignStereochemistry`` cleanup role)."""
        adj = self.adjacency()
        table: Dict[Tuple, int] = {}
        cur = [
            table.setdefault(
                (a.atomic_num, a.formal_charge, self.total_num_hs(i),
                 self.degree(i)),
                len(table),
            )
            for i, a in enumerate(self.atoms)
        ]
        for _ in range(max(1, self.num_atoms())):
            sigs = []
            for i in range(self.num_atoms()):
                nb = sorted(
                    (int(round(self.bonds[bi].value() * 2)),
                     cur[self.bonds[bi].other(i)])
                    for bi in adj[i]
                )
                sigs.append((cur[i], tuple(nb)))
            table2: Dict[Tuple, int] = {}
            nxt = [table2.setdefault(s, len(table2)) for s in sigs]
            stable = len(set(nxt)) == len(set(cur))
            cur = nxt
            if stable:
                break
        return cur

    def assign_stereo_from_3d(self) -> None:
        """Perceive double-bond E/Z and tetrahedral chirality from the
        conformer, mirroring what RDKit's ``MolFromMolFile`` does on 3D
        files (``DetectBondStereochemistry`` +
        ``AssignChiralTypesFrom3D``) — the path real PDBbind ligand SDFs
        take in the reference (`mol.py:37-53`). Conventions (index-
        canonical, self-consistent; exact RDKit tag parity is not
        claimed — docs/PARITY.md):

        - E/Z: reference neighbors are the lowest-index neighbor on each
          end; bond-plane projections anti -> STEREOE, syn -> STEREOZ.
          Ends whose two substituents are WL-graph-equivalent are not
          stereogenic and stay STEREONONE, as does degenerate geometry.
        - Chirality: candidate centers are sp3 C/N/Si/P/S with
          degree + total Hs == 4 and WL-distinct substituents; neighbors
          sorted by index (implicit H last), positive signed volume ->
          CHI_TETRAHEDRAL_CCW, negative -> CW.
        """
        if self.positions is None or self.num_atoms() < 3:
            return
        pos = self.positions.astype(np.float64)
        ranks = self.canonical_ranks()

        for b in self.bonds:
            if (b.order != BOND_ORDER_DOUBLE or b.is_aromatic
                    or b.is_in_ring or b.stereo != "STEREONONE"):
                continue
            na = sorted(j for j in self.neighbors(b.a1) if j != b.a2)
            nb = sorted(j for j in self.neighbors(b.a2) if j != b.a1)
            if not na or not nb or len(na) > 2 or len(nb) > 2:
                continue
            # Symmetric substituents on either end => not stereogenic.
            if len(na) == 2 and ranks[na[0]] == ranks[na[1]]:
                continue
            if len(nb) == 2 and ranks[nb[0]] == ranks[nb[1]]:
                continue
            axis = pos[b.a2] - pos[b.a1]
            an = float(axis @ axis)
            if an < 1e-12:
                continue
            va = pos[na[0]] - pos[b.a1]
            vb = pos[nb[0]] - pos[b.a2]
            va = va - axis * (float(va @ axis) / an)
            vb = vb - axis * (float(vb @ axis) / an)
            norm = float(np.linalg.norm(va) * np.linalg.norm(vb))
            if norm < 1e-9:
                continue
            cosang = float(va @ vb) / norm
            if abs(cosang) < 0.1:  # perpendicular: geometry undecidable
                continue
            b.stereo = "STEREOZ" if cosang > 0 else "STEREOE"

        for i, a in enumerate(self.atoms):
            if (a.chirality != "CHI_UNSPECIFIED" or a.is_aromatic
                    or a.atomic_num not in (6, 7, 14, 15, 16)
                    or a.hybridization != "SP3"):
                continue
            nbrs = sorted(self.neighbors(i))
            if len(nbrs) + self.total_num_hs(i) != 4 or len(nbrs) < 3:
                continue
            ranks_n = [ranks[j] for j in nbrs]
            if len(set(ranks_n)) != len(ranks_n):
                continue  # equivalent substituents: not a stereocenter
            if len(nbrs) == 4:
                ref = pos[nbrs[3]]
                q = [pos[n] for n in nbrs[:3]]
            else:
                # Implicit H ranks last; the signed volume taken from the
                # atom's own position has the same sign as from the H
                # (both lie opposite the substituent plane).
                ref = pos[i]
                q = [pos[n] for n in nbrs]
            v = np.stack([q[0] - ref, q[1] - ref, q[2] - ref])
            det = float(np.linalg.det(v))
            scale = float(np.prod([np.linalg.norm(x) for x in v]))
            if scale < 1e-9 or abs(det) / scale < 0.05:
                continue  # planar/degenerate geometry
            a.chirality = (
                "CHI_TETRAHEDRAL_CCW" if det > 0 else "CHI_TETRAHEDRAL_CW"
            )

    def _perceive_rings(self) -> None:
        """Mark ring atoms/bonds: a bond is in a ring iff it is not a bridge."""
        n = self.num_atoms()
        adj = self.adjacency()
        visited = [False] * n
        disc = [0] * n
        low = [0] * n
        is_bridge = [False] * self.num_bonds()
        timer = [0]

        # Iterative DFS (ligands are small but avoid recursion limits anyway).
        for root in range(n):
            if visited[root]:
                continue
            stack = [(root, -1, iter(adj[root]))]
            visited[root] = True
            timer[0] += 1
            disc[root] = low[root] = timer[0]
            while stack:
                u, pbond, it = stack[-1]
                advanced = False
                for bi in it:
                    if bi == pbond:
                        continue
                    v = self.bonds[bi].other(u)
                    if not visited[v]:
                        visited[v] = True
                        timer[0] += 1
                        disc[v] = low[v] = timer[0]
                        stack.append((v, bi, iter(adj[v])))
                        advanced = True
                        break
                    else:
                        low[u] = min(low[u], disc[v])
                if not advanced:
                    stack.pop()
                    if stack:
                        pu = stack[-1][0]
                        low[pu] = min(low[pu], low[u])
                        if low[u] > disc[pu]:
                            is_bridge[pbond] = True

        for a in self.atoms:
            a.is_in_ring = False
        for bi, b in enumerate(self.bonds):
            b.is_in_ring = not is_bridge[bi]
            if b.is_in_ring:
                self.atoms[b.a1].is_in_ring = True
                self.atoms[b.a2].is_in_ring = True

    def ring_systems(self) -> List[List[int]]:
        """Small rings as atom-index lists, size <= 7: the smallest ring
        through EVERY ring bond (remove the bond, BFS the shortest
        remaining path between its endpoints). Unlike a plain cycle
        basis, this is guaranteed to contain each small chemical ring of
        a fused polycyclic (a basis can represent a benzo ring only as a
        symmetric difference of larger cycles, which broke aromaticity
        perception on kekulized polycyclic ligands). Superset of SSSR
        restricted to size <= 7; duplicates removed."""
        n = self.num_atoms()
        adj = self.adjacency()
        if not self.bonds:
            return []
        # Ring-bond flags may not be assigned yet (perceive() order);
        # a bond is in a ring iff an alternative path joins its ends.
        rings: List[List[int]] = []
        seen: set = set()
        for skip_bi, b in enumerate(self.bonds):
            # BFS from b.a1 to b.a2 avoiding skip_bi, depth-capped at 6.
            start, goal = b.a1, b.a2
            parent = {start: (-1, -1)}
            q = deque([(start, 0)])
            found = False
            while q and not found:
                u, d = q.popleft()
                if d >= 6:
                    continue
                for bi in adj[u]:
                    if bi == skip_bi:
                        continue
                    v = self.bonds[bi].other(u)
                    if v in parent:
                        continue
                    parent[v] = (u, bi)
                    if v == goal:
                        found = True
                        break
                    q.append((v, d + 1))
            if not found:
                continue
            path = [goal]
            u = goal
            while parent[u][0] != -1:
                u = parent[u][0]
                path.append(u)
            if 3 <= len(path) <= 7:
                key = frozenset(path)
                if key not in seen:
                    seen.add(key)
                    rings.append(path)
        return rings

    def _huckel_contribution(self, i: int, in_set) -> Optional[int]:
        """Pi-electron contribution of atom ``i`` inside a candidate
        aromatic set (RDKit default-model electron counting,
        ``Aromaticity.cpp``'s per-atom rules distilled):

        - triple bond or cumulated doubles or >3 sigma connections -> None
          (sp/sp3, aromaticity-incompatible);
        - double or aromatic bond to another set member -> 1;
        - exocyclic double bond (quinone C=O, fulvene C=C) -> 0;
        - saturated group-15/16 heteroatom or anionic C -> 2 (lone-pair
          donor: pyrrole N, furan O, thiophene S, cyclopentadienide C-);
        - cationic saturated C or B -> 0 (empty p: tropylium, borole);
        - anything else (saturated neutral C, cationic N, metals) -> None.
        """
        a = self.atoms[i]
        if a.atomic_num not in AROMATIC_CANDIDATES and a.atomic_num != 5:
            return None
        n_dbl_in = n_dbl_out = n_arom_in = 0
        for bi in self.adjacency()[i]:
            b = self.bonds[bi]
            if b.order == BOND_ORDER_TRIPLE:
                return None
            if b.is_aromatic or b.order == BOND_ORDER_AROMATIC:
                if b.other(i) in in_set:
                    n_arom_in += 1
            elif b.order == BOND_ORDER_DOUBLE:
                if b.other(i) in in_set:
                    n_dbl_in += 1
                else:
                    n_dbl_out += 1
        if n_dbl_in + n_dbl_out > 1:
            return None  # cumulated doubles (allene-like)
        sigma = self.degree(i) + (a.num_explicit_hs or 0)
        if sigma > 3:
            return None  # sp3 framework
        if n_dbl_in or n_arom_in:
            return 1
        if n_dbl_out:
            return 0
        z, chg = a.atomic_num, a.formal_charge
        if z in (8, 16, 34):
            return 2
        if z in (7, 15):
            return 2 if chg <= 0 else None
        if z == 6:
            if chg == -1:
                return 2
            if chg == 1:
                return 0
            return None
        if z == 5:
            return 0  # boron: empty p orbital
        return None

    def _try_mark_aromatic(self, atom_set, bonds) -> bool:
        """Mark ``atom_set`` aromatic if every member is pi-compatible and
        the electron count satisfies Hückel 4n+2. Returns True on change."""
        if all(b.is_aromatic for b in bonds):
            return False  # already perceived (or explicit-flag input)
        in_set = set(atom_set)
        total = 0
        for i in in_set:
            c = self._huckel_contribution(i, in_set)
            if c is None:
                return False
            total += c
        if total < 2 or total % 4 != 2:
            return False
        for i in in_set:
            self.atoms[i].is_aromatic = True
        for b in bonds:
            b.is_aromatic = True
        return True

    def _perceive_aromaticity(self) -> None:
        """Aromaticity via Hückel 4n+2 pi-electron counting (RDKit's
        default aromaticity model, the semantics behind the reference's
        ``Chem.SanitizeMol`` at `mol.py:26-34`): honor explicit flags
        (SMILES lowercase / SDF type-4 / MOL2 ``ar``), then evaluate each
        small ring and each fused ring system on the Kekulé bond orders.
        Per-ring passes iterate to a fixed point so fused systems whose
        Kekulé structure leaves one ring short (indole's pyrrole ring,
        acridine) resolve once their partner ring is marked; the
        whole-system pass catches systems aromatic only as a unit
        (anthracene's middle ring, purine written kekulized)."""
        # Explicit flags from SMILES lowercase / SDF-MOL2 aromatic bond types.
        for b in self.bonds:
            if b.order == BOND_ORDER_AROMATIC:
                b.is_aromatic = True
            if b.is_aromatic:
                self.atoms[b.a1].is_aromatic = True
                self.atoms[b.a2].is_aromatic = True

        rings = []
        for ring in self.ring_systems():
            if len(ring) < 5:
                continue
            bonds = []
            for idx in range(len(ring)):
                b = self.bond_between(ring[idx], ring[(idx + 1) % len(ring)])
                if b is None:
                    break
                bonds.append(b)
            else:
                rings.append((ring, bonds))

        def ring_fixpoint() -> None:
            changed = True
            while changed:
                changed = False
                for ring, bonds in rings:
                    changed |= self._try_mark_aromatic(ring, bonds)

        ring_fixpoint()

        # Fused ring systems: connected components of ring bonds.
        comp_of: Dict[int, int] = {}
        comps: Dict[int, List[Bond]] = {}

        def find(x: int) -> int:
            while comp_of.get(x, x) != x:
                comp_of[x] = comp_of.get(comp_of[x], comp_of[x])
                x = comp_of[x]
            return x

        for b in self.bonds:
            if not b.is_in_ring:
                continue
            ra, rb = find(b.a1), find(b.a2)
            if ra != rb:
                comp_of[ra] = rb
        for b in self.bonds:
            if b.is_in_ring:
                comps.setdefault(find(b.a1), []).append(b)
        for bonds in comps.values():
            atom_set = {b.a1 for b in bonds} | {b.a2 for b in bonds}
            if len(atom_set) >= 5:
                self._try_mark_aromatic(sorted(atom_set), bonds)
        ring_fixpoint()

    def _assign_implicit_hs(self) -> None:
        for i, atom in enumerate(self.atoms):
            if atom.num_explicit_hs is not None:
                atom.num_implicit_hs = atom.num_explicit_hs
                continue
            valences = DEFAULT_VALENCES.get(atom.atomic_num)
            if valences is None:
                atom.num_implicit_hs = 0
                continue
            bond_sum = sum(self.bonds[bi].value() for bi in self.adjacency()[i])
            # Lone-pair donors use their sigma framework as the valence
            # sum: group-16 members (furan O, thiophene S) always donate,
            # and an aromatic N/P whose incident bonds are ALL single in
            # the Kekulé structure donated its lone pair (pyrrole,
            # imidazole, N-methylpyrrole) — it keeps its sigma H count.
            # An aromatic-input "n" (order-4 bonds, no Kekulé orders)
            # correctly means pyridine-type (0 H), matching RDKit; a
            # kekulized pyridine N has a double bond so is excluded too.
            # This rule survives re-perception (remove_hs, copy) because
            # it reads only bond orders, never side tables.
            if atom.is_aromatic and (
                atom.atomic_num in (8, 16, 34)
                or (atom.atomic_num in (7, 15) and all(
                    self.bonds[bi].order == BOND_ORDER_SINGLE
                    for bi in self.adjacency()[i]
                ))
            ):
                bond_sum = self.degree(i)
            else:
                bond_sum = int(round(bond_sum))
            charge_adj = atom.formal_charge
            if atom.atomic_num in (7, 15):  # N+, P+ gain a valence
                effective = [v + charge_adj for v in valences]
            elif atom.atomic_num in (8, 16, 34):  # O+/S+ gain, O- loses
                effective = [v + charge_adj for v in valences]
            elif atom.atomic_num == 6:
                effective = [v - abs(charge_adj) for v in valences]
            elif atom.atomic_num in (9, 17, 35, 53) and charge_adj < 0:
                # Halide anions: Cl- etc. have valence 0, no implicit H
                # (RDKit SanitizeMol semantics for charged halogens).
                effective = [max(0, v + charge_adj) for v in valences]
            else:
                effective = list(valences)
            nh = 0
            for v in effective:
                if bond_sum <= v:
                    nh = v - bond_sum
                    break
            atom.num_implicit_hs = max(0, nh - atom.num_radical_electrons)

    def _assign_hybridization(self) -> None:
        """Orbital-count hybridization (RDKit ``calcHybridization``
        semantics — the reference featurizer's source, `features.py:84`):
        sigma frameworks (total degree) plus lone pairs derived from
        valence-shell electrons minus bonding electrons minus charge and
        radicals, then 2 -> SP, 3 -> SP2, 4 -> SP3, 5 -> SP3D,
        6 -> SP3D2. Notable consequences matching RDKit: amide/amine N is
        SP3, sulfoxide/sulfone S is SP3, pyrrole N is SP2 (its lone pair
        sits in the aromatic pi system), halogens and water O are SP3."""
        for i, atom in enumerate(self.atoms):
            outer = N_OUTER_ELECS.get(atom.atomic_num)
            if atom.atomic_num == 1 or outer is None:
                atom.hybridization = "misc"
                continue
            if atom.is_aromatic:
                # Ring members are SP2 regardless of lone-pair count (the
                # donated pair sits in the pi system): pyrrole N, furan O,
                # thiophene S all report SP2 in RDKit.
                atom.hybridization = "SP2"
                continue
            bond_order_sum = sum(
                self.bonds[bi].value() for bi in self.adjacency()[i]
            )
            # Explicit-H bonds are already in bond_order_sum; add implicit.
            total_valence = (
                int(round(bond_order_sum)) + atom.num_implicit_hs
            )
            lone_electrons = max(
                0,
                outer - total_valence - atom.formal_charge
                - atom.num_radical_electrons,
            )
            norbs = self.total_degree(i) + lone_electrons // 2
            atom.hybridization = {
                2: "SP", 3: "SP2", 4: "SP3", 5: "SP3D", 6: "SP3D2",
            }.get(norbs, "misc")

    def _assign_conjugation(self) -> None:
        """Bond conjugation with RDKit ``MolOps::setConjugation`` semantics
        (the reference featurizer's is_conjugated source, `features.py:58`):
        each 2-3-coordinate "candidate" atom holding a multiple/aromatic
        bond marks that bond AND a neighboring bond conjugated when the
        neighbor's far atom is itself a candidate. Candidate = aromatic, or
        a first-two-row atom with available pi/lone-pair electrons.

        Reproduces: amide/ester/acid C-X + C=O, butadiene's central single
        bond, styrene's vinyl, carboxylate, aromatic rings. Leaves
        unconjugated: isolated C=C / C=O / C#N, sulfoxide S=O, and
        P/S lone-pair "donors" (RDKit's Issue211 first-two-rows rule)."""
        adj = self.adjacency()

        def pi_lp_electrons(i: int) -> int:
            # RDKit MolOps::countAtomElec: default valence + lone-pair
            # electrons - total degree; -1 for univalent or >3-coordinate.
            a = self.atoms[i]
            valences = DEFAULT_VALENCES.get(a.atomic_num)
            if not valences or valences[0] <= 1:
                return -1
            degree = self.total_degree(i)
            if degree > 3:
                return -1
            outer = N_OUTER_ELECS.get(a.atomic_num)
            if outer is None:
                return -1
            lone_pair_e = outer - valences[0] - a.formal_charge
            return valences[0] + lone_pair_e - degree

        def is_candidate(i: int) -> bool:
            a = self.atoms[i]
            return a.is_aromatic or (
                a.atomic_num <= 10 and pi_lp_electrons(i) > 0
            )

        for b in self.bonds:
            b.is_conjugated = b.is_aromatic
        for i in range(len(self.atoms)):
            if not (2 <= self.total_degree(i) <= 3) or not is_candidate(i):
                continue
            for bi in adj[i]:
                b1 = self.bonds[bi]
                if not (b1.is_aromatic or b1.order >= 2):
                    continue
                for bj in adj[i]:
                    if bj == bi:
                        continue
                    b2 = self.bonds[bj]
                    far = b2.a2 if b2.a1 == i else b2.a1
                    if is_candidate(far):
                        b1.is_conjugated = True
                        b2.is_conjugated = True

    # ------------------------------------------------------------ topological
    def distance_matrix(self) -> np.ndarray:
        """All-pairs shortest path lengths over the bond graph (BFS),
        mirroring ``Chem.GetDistanceMatrix`` (`data.py:45`). Unreachable
        pairs get a large finite value (1e8, as RDKit does)."""
        n = self.num_atoms()
        dist = np.full((n, n), 1e8, dtype=np.float64)
        adj = self.adjacency()
        for s in range(n):
            dist[s, s] = 0.0
            q = deque([s])
            while q:
                u = q.popleft()
                for bi in adj[u]:
                    v = self.bonds[bi].other(u)
                    if dist[s, v] > dist[s, u] + 1:
                        dist[s, v] = dist[s, u] + 1
                        q.append(v)
        return dist

    # -------------------------------------------------------------- transform
    def remove_hs(self) -> "Molecule":
        """Heavy-atom subgraph; removed Hs are folded into explicit-H counts
        (mirrors ``Chem.RemoveHs``)."""
        keep = [i for i, a in enumerate(self.atoms) if a.atomic_num != 1]
        remap = {old: new for new, old in enumerate(keep)}
        atoms: List[Atom] = []
        for old in keep:
            a = dataclasses.replace(self.atoms[old])
            n_h = sum(
                1 for j in self.neighbors(old) if self.atoms[j].atomic_num == 1
            )
            if n_h:
                # After removal these hydrogens become fixed explicit
                # counts. num_implicit_hs is only added when it was
                # derived (num_explicit_hs None): perception copies an
                # explicit count INTO num_implicit_hs, so adding both
                # would double-count.
                if a.num_explicit_hs is not None:
                    a.num_explicit_hs = a.num_explicit_hs + n_h
                else:
                    a.num_explicit_hs = n_h + a.num_implicit_hs
            atoms.append(a)
        bonds = [
            dataclasses.replace(b, a1=remap[b.a1], a2=remap[b.a2])
            for b in self.bonds
            if b.a1 in remap and b.a2 in remap
        ]
        positions = None
        if self.positions is not None:
            positions = self.positions[keep]
        mol = Molecule(atoms, bonds, positions, self.name)
        return mol.perceive()

    def copy(self) -> "Molecule":
        return Molecule(
            [dataclasses.replace(a) for a in self.atoms],
            [dataclasses.replace(b) for b in self.bonds],
            None if self.positions is None else self.positions.copy(),
            self.name,
        )


# ------------------------------------------------------------------- parsers
def mol_from_sdf(text_or_path: Union[str, Path], *, is_path: bool = True) -> Molecule:
    """Parse the first record of an SDF/MOL (V2000) file."""
    if is_path:
        text = Path(text_or_path).read_text()
    else:
        text = str(text_or_path)
    lines = text.splitlines()
    if len(lines) < 4:
        raise ValueError("SDF file too short.")
    name = lines[0].strip()
    counts = lines[3]
    try:
        n_atoms = int(counts[0:3])
        n_bonds = int(counts[3:6])
    except ValueError as e:
        raise ValueError(f"Bad SDF counts line: {counts!r}") from e
    atoms: List[Atom] = []
    positions = np.zeros((n_atoms, 3), dtype=np.float32)
    for i in range(n_atoms):
        ln = lines[4 + i]
        x, y, z = float(ln[0:10]), float(ln[10:20]), float(ln[20:30])
        symbol = ln[31:34].strip()
        if symbol in ("*", "R", "R#", "Du"):
            atomic_num = 0  # wildcard/dummy — round-trips the '*' ligand
        else:
            atomic_num = ATOMIC_NUM.get(symbol) or ATOMIC_NUM.get(
                symbol.capitalize()
            )
        if atomic_num is None:
            raise ValueError(f"Unknown element in SDF: {symbol!r}")
        chg_code = int(ln[36:39]) if len(ln) >= 39 and ln[36:39].strip() else 0
        # SDF charge codes: 0 none, 1:+3, 2:+2, 3:+1, 4 radical, 5:-1, 6:-2, 7:-3
        charge = {1: 3, 2: 2, 3: 1, 5: -1, 6: -2, 7: -3}.get(chg_code, 0)
        radical = 1 if chg_code == 4 else 0
        positions[i] = (x, y, z)
        atoms.append(Atom(atomic_num, formal_charge=charge,
                          num_radical_electrons=radical))
    bonds: List[Bond] = []
    for i in range(n_bonds):
        ln = lines[4 + n_atoms + i]
        a1, a2 = int(ln[0:3]) - 1, int(ln[3:6]) - 1
        order = int(ln[6:9])
        bonds.append(Bond(a1, a2, order=order,
                          is_aromatic=(order == BOND_ORDER_AROMATIC)))
    # M  CHG / M  RAD property lines SUPERSEDE the whole atom-block
    # charge column (CTfile spec: the presence of either invalidates
    # every legacy charge/radical code, not just the listed atoms).
    superseded = False
    for ln in lines[4 + n_atoms + n_bonds:]:
        if ln.startswith("M  CHG") or ln.startswith("M  RAD"):
            if not superseded:
                for a in atoms:
                    a.formal_charge = 0
                    a.num_radical_electrons = 0
                superseded = True
            fields = ln.split()
            cnt = int(fields[2])
            for k in range(cnt):
                idx = int(fields[3 + 2 * k]) - 1
                val = int(fields[4 + 2 * k])
                if ln.startswith("M  CHG"):
                    atoms[idx].formal_charge = val
                else:
                    atoms[idx].num_radical_electrons = val
        elif ln.startswith("M  END") or ln.startswith("$$$$"):
            break
    mol = Molecule(atoms, bonds, positions, name).perceive()
    mol.assign_stereo_from_3d()
    return mol


_MOL2_BOND_ORDER = {"1": 1, "2": 2, "3": 3, "ar": BOND_ORDER_AROMATIC,
                    "am": 1, "du": 1, "un": 1, "nc": 0}


def mol_from_mol2(text_or_path: Union[str, Path], *, is_path: bool = True) -> Molecule:
    """Parse a TRIPOS MOL2 file (first molecule record)."""
    if is_path:
        text = Path(text_or_path).read_text()
    else:
        text = str(text_or_path)
    lines = text.splitlines()
    section = None
    name = ""
    atoms: List[Atom] = []
    sybyls: List[str] = []
    positions: List[Tuple[float, float, float]] = []
    bonds: List[Bond] = []
    mol_lines = 0
    for ln in lines:
        s = ln.strip()
        if s.startswith("@<TRIPOS>"):
            section = s[9:].upper()
            mol_lines = 0
            continue
        if section == "MOLECULE":
            mol_lines += 1
            if mol_lines == 1:
                name = s
        elif section == "ATOM" and s:
            fields = s.split()
            x, y, z = float(fields[2]), float(fields[3]), float(fields[4])
            sybyl = fields[5]
            symbol = sybyl.split(".")[0]
            atomic_num = ATOMIC_NUM.get(symbol) or ATOMIC_NUM.get(symbol.capitalize())
            if atomic_num is None:
                # Dummy/lp atoms: skip silently is dangerous; raise instead.
                raise ValueError(f"Unknown MOL2 atom type: {sybyl!r}")
            # MOL2 column 9 is a PARTIAL charge (usually Gasteiger);
            # rounding it would fabricate formal charges (a carboxylate's
            # -0.571 oxygens both became -1). Accept it only when it IS a
            # formal charge (exactly integral, the FORMAL_CHARGES
            # convention); otherwise derive from the SYBYL type below.
            charge = 0
            if len(fields) >= 9:
                try:
                    c = float(fields[8])
                    if abs(c - round(c)) < 1e-3:
                        charge = int(round(c))
                except ValueError:
                    charge = 0
            if sybyl == "N.4":  # quaternary ammonium is formally +1
                charge = max(charge, 1)
            sybyls.append(sybyl)
            atoms.append(Atom(atomic_num, formal_charge=charge))
            positions.append((x, y, z))
        elif section == "BOND" and s:
            fields = s.split()
            a1, a2 = int(fields[1]) - 1, int(fields[2]) - 1
            order = _MOL2_BOND_ORDER.get(fields[3].lower(), 1)
            if order == 0:
                continue
            bonds.append(Bond(a1, a2, order=order,
                              is_aromatic=(order == BOND_ORDER_AROMATIC)))
    if not atoms:
        raise ValueError("No atoms parsed from MOL2 file.")
    # Carboxylate O.co2 pairs: the group is formally -1 on ONE oxygen
    # (RDKit's mol2 reader kekulizes it that way). When the charge
    # column supplied only partial charges, assign it deterministically:
    # the single-bonded oxygen, else the later one.
    co2_by_carbon: Dict[int, List[Tuple[int, int]]] = {}
    for b in bonds:
        for o, c in ((b.a1, b.a2), (b.a2, b.a1)):
            if (o < len(sybyls) and sybyls[o] == "O.co2"
                    and atoms[c].atomic_num == 6):
                co2_by_carbon.setdefault(c, []).append((o, b.order))
    for c, pairs in co2_by_carbon.items():
        if len(pairs) != 2 or any(atoms[o].formal_charge for o, _ in pairs):
            continue
        singles = [o for o, order in pairs if order == 1]
        target = singles[0] if singles else max(o for o, _ in pairs)
        atoms[target].formal_charge = -1
    mol = Molecule(
        atoms, bonds, np.array(positions, dtype=np.float32), name
    ).perceive()
    mol.assign_stereo_from_3d()
    return mol


def mol_from_smiles(smiles: str) -> Molecule:
    """Parse a SMILES string (no coordinates). See ``smiles.py``."""
    from .smiles import parse_smiles

    mol = parse_smiles(smiles)
    return mol.perceive()


def mol_from_file(path: Union[Path, str]) -> Molecule:
    """Load a ligand from .sdf/.mol2 and standardize — the reference's
    ``mol_from_file`` (`mol.py:37-53`)."""
    path = Path(path)
    if path.suffix == ".sdf":
        mol = mol_from_sdf(path)
    elif path.suffix == ".mol2":
        mol = mol_from_mol2(path)
    else:
        raise ValueError(f"Unrecognized file format: {path.suffix}.")
    return standardize_mol(mol)


def standardize_mol(mol: Molecule) -> Molecule:
    """Perceive + strip hydrogens (reference `mol.py:26-34`)."""
    mol = mol.copy()
    mol.perceive()
    return mol.remove_hs()


# ------------------------------------------------------------------- writers
def kekulized_bond_orders(mol: Molecule) -> List[int]:
    """Kekulé bond orders for serialization (RDKit ``Kekulize``
    semantics, which RDKit's SDWriter applies before writing — real
    PDBbind SDFs arrive in this form): aromatic bonds resolve to
    alternating single/double via a perfect matching over the atoms
    whose charge-adjusted valence demands one more bond. A system with
    no matching (inconsistent aromatic flags) falls back to the SDF
    aromatic bond type 4 rather than failing."""
    adj = mol.adjacency()
    orders: List[Optional[int]] = [
        None if (b.is_aromatic or b.order == BOND_ORDER_AROMATIC) else b.order
        for b in mol.bonds
    ]
    if all(o is not None for o in orders):
        return orders  # type: ignore[return-value]

    arom_adj: Dict[int, List[int]] = {}
    for bi, b in enumerate(mol.bonds):
        if orders[bi] is None:
            arom_adj.setdefault(b.a1, []).append(bi)
            arom_adj.setdefault(b.a2, []).append(bi)

    def needs_double(i: int) -> bool:
        a = mol.atoms[i]
        valences = DEFAULT_VALENCES.get(a.atomic_num)
        if valences is None:
            return False
        chg = a.formal_charge
        if a.atomic_num in (7, 8, 15, 16, 34):
            target = valences[0] + chg
        elif a.atomic_num == 6:
            target = valences[0] - abs(chg)
        else:
            target = valences[0]
        sigma = mol.degree(i) + a.num_implicit_hs
        extra = sum(
            mol.bonds[bi].order - 1
            for bi in adj[i]
            if not (mol.bonds[bi].is_aromatic
                    or mol.bonds[bi].order == BOND_ORDER_AROMATIC)
            and mol.bonds[bi].order in (2, 3)
        )
        return (target - sigma - extra) >= 1

    # Connected components of the aromatic subgraph, matched independently
    # so one unkekulizable system degrades only itself.
    seen_atoms: set = set()
    for start in sorted(arom_adj):
        if start in seen_atoms:
            continue
        comp_atoms: List[int] = []
        comp_bonds: set = set()
        stack = [start]
        seen_atoms.add(start)
        while stack:
            u = stack.pop()
            comp_atoms.append(u)
            for bi in arom_adj[u]:
                comp_bonds.add(bi)
                v = mol.bonds[bi].other(u)
                if v not in seen_atoms:
                    seen_atoms.add(v)
                    stack.append(v)

        unmatched = {i for i in comp_atoms if needs_double(i)}
        assign: Dict[int, int] = {}

        def backtrack() -> bool:
            if not unmatched:
                return True
            # Most-constrained atom first.
            def n_options(x: int) -> int:
                return sum(
                    1 for bi in arom_adj[x]
                    if bi not in assign and mol.bonds[bi].other(x) in unmatched
                )
            i = min(unmatched, key=n_options)
            cands = [bi for bi in arom_adj[i]
                     if bi not in assign and mol.bonds[bi].other(i) in unmatched]
            for bi in cands:
                j = mol.bonds[bi].other(i)
                unmatched.difference_update((i, j))
                assign[bi] = BOND_ORDER_DOUBLE
                if backtrack():
                    return True
                unmatched.update((i, j))
                del assign[bi]
            return False

        if backtrack():
            for bi in comp_bonds:
                orders[bi] = assign.get(bi, BOND_ORDER_SINGLE)
        else:
            for bi in comp_bonds:
                orders[bi] = BOND_ORDER_AROMATIC
    return [o if o is not None else BOND_ORDER_AROMATIC for o in orders]


def mol_to_sdf(mol: Molecule, name: Optional[str] = None) -> str:
    """Serialize one molecule as an SDF (V2000) record. Aromatic bonds
    are written kekulized (single/double), matching RDKit's SDWriter;
    aromaticity and heteroatom H counts are recovered on read by the
    Hückel perception + lone-pair-donor valence rules."""
    pos = mol.positions
    if pos is None:
        pos = np.zeros((mol.num_atoms(), 3), dtype=np.float32)
    lines = [name if name is not None else mol.name, "  PRDTPU", ""]
    lines.append(
        f"{mol.num_atoms():>3}{mol.num_bonds():>3}  0  0  0  0  0  0  0  0999 V2000"
    )
    for i, a in enumerate(mol.atoms):
        x, y, z = pos[i]
        lines.append(
            f"{x:>10.4f}{y:>10.4f}{z:>10.4f} {a.symbol:<3} 0  0  0  0  0  0"
            "  0  0  0  0  0  0"
        )
    kek = kekulized_bond_orders(mol)
    for b, order in zip(mol.bonds, kek):
        lines.append(f"{b.a1 + 1:>3}{b.a2 + 1:>3}{order:>3}  0")
    charged = [(i, a.formal_charge) for i, a in enumerate(mol.atoms)
               if a.formal_charge != 0]
    for i in range(0, len(charged), 8):
        chunk = charged[i:i + 8]
        parts = "".join(f" {idx + 1:>3} {chg:>3}" for idx, chg in chunk)
        lines.append(f"M  CHG{len(chunk):>3}{parts}")
    lines.append("M  END")
    lines.append("$$$$")
    return "\n".join(lines) + "\n"


def mols_to_sdf_file(mols: Sequence[Molecule], path: Union[str, Path]) -> None:
    with open(path, "w") as f:
        for mol in mols:
            f.write(mol_to_sdf(mol))


def mols_from_sdf_file(path: Union[str, Path]) -> List[Molecule]:
    """Parse EVERY record of a multi-record SDF file (the generation
    CLIs write one record per sample, `cli/generate.py`)."""
    mols: List[Molecule] = []
    record: List[str] = []
    # line-wise accumulation: the record's NAME line may be empty, so
    # splitting on "$$$$" and stripping newlines would eat it
    for line in Path(path).read_text().splitlines():
        if line.strip() == "$$$$":
            if any(l.strip() for l in record):
                mols.append(
                    mol_from_sdf("\n".join(record), is_path=False)
                )
            record = []
        else:
            record.append(line)
    if any(l.strip() for l in record):
        mols.append(mol_from_sdf("\n".join(record), is_path=False))
    return mols


# ------------------------------------------------------------------ geometry
def get_mol_positions(mol: Molecule) -> np.ndarray:
    """Conformer coordinates (reference `mol.py:56-62`)."""
    assert mol.positions is not None, "Molecule has no conformer."
    return mol.positions.astype(np.float32)


def update_mol_positions(mol: Molecule, pos: np.ndarray) -> Molecule:
    """Functional positional update (reference `mol.py:65-78`)."""
    mol = mol.copy()
    pos = np.asarray(pos, dtype=np.float32)
    assert pos.shape == (mol.num_atoms(), 3)
    mol.positions = pos
    return mol
