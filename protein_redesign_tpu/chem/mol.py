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

Perception here is heuristic (no Hückel electron counting beyond standard
ring patterns); exact RDKit parity is impossible without RDKit, which is
intentionally not a dependency of this framework.
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
        """Small rings (cycle basis, Paton) as atom-index lists, size <= 7."""
        n = self.num_atoms()
        adj = self.adjacency()
        parent = [-1] * n
        parent_bond = [-1] * n
        depth = [-1] * n
        rings: List[List[int]] = []
        seen_edges = set()
        for root in range(n):
            if depth[root] >= 0:
                continue
            depth[root] = 0
            q = deque([root])
            while q:
                u = q.popleft()
                for bi in adj[u]:
                    v = self.bonds[bi].other(u)
                    if depth[v] < 0:
                        depth[v] = depth[u] + 1
                        parent[v] = u
                        parent_bond[v] = bi
                        q.append(v)
                    elif bi != parent_bond[u] and (bi not in seen_edges):
                        seen_edges.add(bi)
                        # Found a cycle: walk both endpoints to their LCA.
                        pu, pv = u, v
                        left, right = [pu], [pv]
                        while depth[pu] > depth[pv]:
                            pu = parent[pu]
                            left.append(pu)
                        while depth[pv] > depth[pu]:
                            pv = parent[pv]
                            right.append(pv)
                        while pu != pv:
                            pu = parent[pu]
                            pv = parent[pv]
                            left.append(pu)
                            right.append(pv)
                        ring = left + right[-2::-1]
                        if 3 <= len(ring) <= 7:
                            rings.append(ring)
        return rings

    def _perceive_aromaticity(self) -> None:
        """Heuristic aromaticity: honor explicit flags, then mark planar
        alternating rings (benzene-like) and classic heteroaromatics."""
        self._lone_pair_donors: set = getattr(
            self, "_lone_pair_donors", set()
        )
        # Explicit flags from SMILES lowercase / SDF-MOL2 aromatic bond types.
        for b in self.bonds:
            if b.order == BOND_ORDER_AROMATIC:
                b.is_aromatic = True
            if b.is_aromatic:
                self.atoms[b.a1].is_aromatic = True
                self.atoms[b.a2].is_aromatic = True

        # Kekulé-form detection: rings where every atom is a candidate element
        # and the ring alternates single/double (6-ring) or has the classic
        # 5-ring heteroaromatic pattern (2 double bonds + 1 heteroatom).
        for ring in self.ring_systems():
            k = len(ring)
            if k not in (5, 6):
                continue
            ring_bonds = []
            ok = True
            for idx in range(k):
                i, j = ring[idx], ring[(idx + 1) % k]
                b = self.bond_between(i, j)
                if b is None:
                    ok = False
                    break
                ring_bonds.append(b)
            if not ok:
                continue
            if any(a not in AROMATIC_CANDIDATES
                   for a in (self.atoms[i].atomic_num for i in ring)):
                continue
            if any(b.order == BOND_ORDER_TRIPLE for b in ring_bonds):
                continue
            n_double = sum(1 for b in ring_bonds if b.order == BOND_ORDER_DOUBLE)
            already = all(b.is_aromatic for b in ring_bonds)
            aromatic = already
            if not aromatic and k == 6 and n_double == 3:
                # Alternation check.
                orders = [b.order for b in ring_bonds]
                aromatic = all(
                    orders[t] != orders[(t + 1) % k] for t in range(k)
                )
            if not aromatic and k == 5 and n_double == 2:
                # Classic furan/pyrrole/thiophene/imidazole pattern: the
                # atom flanked by two single bonds donates a lone pair.
                for idx in range(k):
                    prev_b = ring_bonds[(idx - 1) % k]
                    next_b = ring_bonds[idx]
                    if (prev_b.order == BOND_ORDER_SINGLE
                            and next_b.order == BOND_ORDER_SINGLE):
                        donor = self.atoms[ring[idx]]
                        if donor.atomic_num in (7, 8, 15, 16, 34):
                            aromatic = True
                            # Record the donor: after the ring bonds
                            # become 1.5, implicit-H assignment can no
                            # longer see that its Kekule valence was 2
                            # (pyrrole N must keep its H; an aromatic-
                            # input "n" correctly means pyridine-type,
                            # so only Kekule detection records donors).
                            self._lone_pair_donors.add(ring[idx])
                        break
            if aromatic:
                for i in ring:
                    self.atoms[i].is_aromatic = True
                for b in ring_bonds:
                    b.is_aromatic = True

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
            # and Kekule-detected 5-ring donors (pyrrole/imidazole NH —
            # recorded by _perceive_aromaticity before the ring bonds
            # became 1.5) keep their H the same way. Aromatic-input "n"
            # without [nH] correctly means pyridine-type (0 H), matching
            # RDKit.
            if atom.is_aromatic and (
                atom.atomic_num in (8, 16, 34)
                or i in getattr(self, "_lone_pair_donors", ())
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
    return Molecule(atoms, bonds, positions, name).perceive()


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
    return Molecule(
        atoms, bonds, np.array(positions, dtype=np.float32), name
    ).perceive()


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
def mol_to_sdf(mol: Molecule, name: Optional[str] = None) -> str:
    """Serialize one molecule as an SDF (V2000) record."""
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
    for b in mol.bonds:
        order = BOND_ORDER_AROMATIC if b.is_aromatic else b.order
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
