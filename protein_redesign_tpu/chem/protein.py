"""Protein representation and PDB/FASTA I/O (pure Python/NumPy).

Behavioral parity with the reference (`/root/reference/ProteinReDiff/protein.py`):
same 20-residue vocabulary with ``X`` -> -1, same 37-atom table, the same
skip-hetero / reject-insertion-code parsing rules, and byte-identical PDB
output formatting. The reference parses via BioPython; here a fixed-column
PDB reader is built in so the framework has no bio dependency.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Dict, Iterable, List, Tuple, Union

import numpy as np

# fmt: off
RESIDUE_TYPES = [
    "A", "R", "N", "D", "C", "Q", "E", "G", "H", "I",
    "L", "K", "M", "F", "P", "S", "T", "W", "Y", "V"
]
RESIDUE_TYPE_INDEX = {name: index for index, name in enumerate(RESIDUE_TYPES)}
RESIDUE_TYPE_INDEX["X"] = -1

RESIDUE_NAMES = [
    "ALA", "ARG", "ASN", "ASP", "CYS", "GLN", "GLU", "GLY", "HIS", "ILE",
    "LEU", "LYS", "MET", "PHE", "PRO", "SER", "THR", "TRP", "TYR", "VAL"
]
RESIDUE_NAME_INDEX = {name: index for index, name in enumerate(RESIDUE_NAMES)}

RESIDUE_ATOMS = [
    "N", "CA", "C", "CB", "O", "CG", "CG1", "CG2", "OG", "OG1", "SG", "CD",
    "CD1", "CD2", "ND1", "ND2", "OD1", "OD2", "SD", "CE", "CE1", "CE2", "CE3",
    "NE", "NE1", "NE2", "OE1", "OE2", "CH2", "NH1", "NH2", "OH", "CZ", "CZ2",
    "CZ3", "NZ", "OXT"
]
RESIDUE_ATOM_INDEX = {name: index for index, name in enumerate(RESIDUE_ATOMS)}

PDB_CHAIN_IDS = "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789"
# fmt: on

NUM_RESIDUE_ATOMS = len(RESIDUE_ATOMS)


@dataclasses.dataclass(frozen=True)
class Protein:
    """Per-residue arrays (reference `protein.py:53-59`):
    chain_index [N], residue_index [N], aatype [N] (−1 = X/mask),
    atom_pos [N,37,3] Å, atom_mask [N,37]."""

    chain_index: np.ndarray
    residue_index: np.ndarray
    aatype: np.ndarray
    atom_pos: np.ndarray
    atom_mask: np.ndarray

    def __len__(self) -> int:
        return len(self.aatype)


def protein_from_pdb_string(pdb_str: str) -> Protein:
    """Parse the first model of a PDB string.

    Matches the reference semantics (`protein.py:62-101`): hetero residues
    skipped, insertion codes rejected, unknown atom names ignored, chains
    re-indexed by sorted unique chain id. Fixed-column ATOM parsing follows
    the PDB v3.3 spec; altloc other than ' '/'A' is skipped.
    """
    residues: Dict[Tuple[str, int], Dict[str, np.ndarray]] = {}
    order: List[Tuple[str, int]] = []
    res_names: Dict[Tuple[str, int], str] = {}
    for line in pdb_str.splitlines():
        record = line[0:6]
        if record == "ENDMDL":
            break  # first model only
        if record != "ATOM  ":
            continue
        atom_name = line[12:16].strip()
        altloc = line[16]
        if altloc not in (" ", "A"):
            continue
        res_name = line[17:20].strip()
        chain_id = line[21]
        try:
            res_seq = int(line[22:26])
        except ValueError:
            continue
        icode = line[26]
        if icode != " ":
            raise ValueError("Insertion codes are not supperted.")
        if res_name not in RESIDUE_NAME_INDEX:
            continue  # non-standard residue (BioPython would still parse it,
            # but the reference's aatype lookup would KeyError; skipping keeps
            # standard complexes identical and is strictly more robust)
        key = (chain_id, res_seq)
        if key not in residues:
            residues[key] = {
                "pos": np.zeros((NUM_RESIDUE_ATOMS, 3), dtype=np.float32),
                "mask": np.zeros((NUM_RESIDUE_ATOMS,), dtype=np.float32),
            }
            order.append(key)
            res_names[key] = res_name
        if atom_name not in RESIDUE_ATOM_INDEX:
            continue
        atom_index = RESIDUE_ATOM_INDEX[atom_name]
        x = float(line[30:38])
        y = float(line[38:46])
        z = float(line[46:54])
        residues[key]["pos"][atom_index] = (x, y, z)
        residues[key]["mask"][atom_index] = 1.0

    if not order:
        raise ValueError("No standard protein residues found in PDB input.")

    chain_ids = [key[0] for key in order]
    unique_chain_ids = sorted(set(chain_ids))
    chain_index = np.array(
        [unique_chain_ids.index(c) for c in chain_ids], dtype=np.int64
    )
    residue_index = np.array([key[1] for key in order], dtype=np.int64)
    aatype = np.array(
        [RESIDUE_NAME_INDEX[res_names[key]] for key in order], dtype=np.int64
    )
    atom_pos = np.stack([residues[key]["pos"] for key in order])
    atom_mask = np.stack([residues[key]["mask"] for key in order])
    return Protein(
        chain_index=chain_index,
        residue_index=residue_index,
        aatype=aatype,
        atom_pos=atom_pos,
        atom_mask=atom_mask,
    )


def protein_from_pdb_file(pdb_path: Union[str, Path]) -> Protein:
    with open(pdb_path, "r") as f:
        return protein_from_pdb_string(f.read())


def proteins_from_pdb_file(pdb_path: Union[str, Path]) -> List[Protein]:
    """Split a multi-model PDB into per-model proteins (same contract as
    reference `protein.py:110-121`). Line-scanning: MODEL opens a fresh
    buffer, ENDMDL flushes it; a plain single-model file (no MODEL/ENDMDL
    records) yields one protein."""
    proteins: List[Protein] = []
    buffered: List[str] = []

    def flush() -> None:
        block = "\n".join(buffered)
        buffered.clear()
        if block.strip():
            proteins.append(protein_from_pdb_string(block))

    with open(pdb_path, "r") as f:
        for raw in f:
            record = raw[:6].rstrip()
            if record == "MODEL":
                buffered.clear()
            elif record == "ENDMDL":
                flush()
            else:
                buffered.append(raw.rstrip("\n"))
    flush()
    return proteins


def _atom_record(
    serial: int, atom: str, res3: str, chain: str, seq: int,
    xyz: np.ndarray,
) -> str:
    """One fixed-column ATOM line (PDB v3.3 columns; altloc/icode blank,
    occupancy 1.00, B-factor 0.00, element = first character of the atom
    name, charge blank, padded to 80 columns). Byte-identical to the
    reference writer's output (`protein.py:124-156`)."""
    name4 = atom if len(atom) == 4 else f" {atom:<3}"
    coords = "".join(f"{float(c):8.3f}" for c in xyz)
    return (
        f"ATOM  {serial:5d} {name4} {res3} {chain}{seq:4d}    "
        f"{coords}  1.00  0.00          {atom[0]:>2}  "
    ).ljust(80)


def protein_to_pdb_string(prot: Protein) -> str:
    """Serialize to PDB text; one ATOM record per unmasked atom slot, in
    residue-major 37-slot order, with serials numbered from 1."""
    lines: List[str] = []
    for i, aa in enumerate(prot.aatype):
        present = np.flatnonzero(prot.atom_mask[i] >= 0.5)
        for slot in present:
            lines.append(
                _atom_record(
                    serial=len(lines) + 1,
                    atom=RESIDUE_ATOMS[slot],
                    res3=RESIDUE_NAMES[aa],
                    chain=PDB_CHAIN_IDS[prot.chain_index[i]],
                    seq=int(prot.residue_index[i]),
                    xyz=prot.atom_pos[i, slot],
                )
            )
    return "\n".join(lines) + "\n"


def protein_to_pdb_file(prot: Protein, pdb_path: Union[str, Path]) -> None:
    with open(pdb_path, "w") as f:
        f.write(protein_to_pdb_string(prot))


def proteins_to_pdb_file(
    proteins: Iterable[Protein], pdb_path: Union[str, Path]
) -> None:
    """Multi-model PDB writer (reference `protein.py:165-174`)."""
    pdb_str = ""
    for model_id, prot in enumerate(proteins, 1):
        pdb_str += f"MODEL      {model_id:>3}".ljust(80) + "\n"
        pdb_str += protein_to_pdb_string(prot)
        pdb_str += "ENDMDL".ljust(80) + "\n"
    with open(pdb_path, "w") as f:
        f.write(pdb_str)


def protein_from_sequence(sequence: str) -> Protein:
    """Sequence string (with ``X`` masks, aatype -1) -> single-chain,
    CA-only, zero-coordinate protein (same contract as reference
    `protein.py:177-191`)."""
    n = len(sequence)
    aatype = np.fromiter(
        (RESIDUE_TYPE_INDEX[s] for s in sequence), dtype=np.int64, count=n
    )
    ca_mask = np.zeros((n, NUM_RESIDUE_ATOMS), dtype=np.float32)
    ca_mask[:, RESIDUE_ATOM_INDEX["CA"]] = 1.0
    return Protein(
        chain_index=np.zeros(n, dtype=np.int64),
        residue_index=np.arange(n, dtype=np.int64),
        aatype=aatype,
        atom_pos=np.zeros((n, NUM_RESIDUE_ATOMS, 3), dtype=np.float32),
        atom_mask=ca_mask,
    )


def protein_to_sequence(prot: Protein) -> str:
    return "".join([RESIDUE_TYPES[aa] for aa in prot.aatype])


def protein_to_ca_trace(prot: Protein) -> "Protein":
    """CA-only copy (the reference's ``protein_to_ca_mol``,
    `protein.py:198-202`, returns an RDKit mol of the CA trace; here the
    same information stays a Protein with all non-CA atoms masked)."""
    ca_atom_mask = np.zeros_like(prot.atom_mask)
    ca_atom_mask[:, 1] = 1.0
    return dataclasses.replace(
        prot, atom_mask=ca_atom_mask * prot.atom_mask
    )


# -------------------------------------------------------------------- FASTA
def read_fasta(path: Union[str, Path]) -> List[Tuple[str, str]]:
    """Parse a FASTA file into (name, sequence) pairs."""
    entries: List[Tuple[str, str]] = []
    name = None
    chunks: List[str] = []
    with open(path, "r") as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            if line.startswith(">"):
                if name is not None:
                    entries.append((name, "".join(chunks)))
                name = line[1:].split()[0]
                chunks = []
            else:
                chunks.append(line)
    if name is not None:
        entries.append((name, "".join(chunks)))
    return entries


def write_fasta(
    entries: Iterable[Tuple[str, str]], path: Union[str, Path]
) -> None:
    with open(path, "w") as f:
        for name, seq in entries:
            f.write(f">{name}\n{seq}\n")
