"""Dataset-as-domain drug discovery tasks (malaria, solvent).

Rebuild of experiments/_generate_drug_dataset.py / _malaria.py /
_solvent.py. The reference featurizes SMILES into 2048-bit Morgan
fingerprints via RDKit; RDKit is not available in this image, so the
featurizer falls back to a hashed character-n-gram fingerprint of the SMILES
string (still a sparse 2048-bit similarity-preserving encoding compatible
with the Tanimoto kernel and the dataset-prior machinery). When RDKit is
importable, real Morgan fingerprints are used.
"""
from __future__ import annotations

import csv
import os
import zlib
from typing import Optional

import numpy as np
import jax.numpy as jnp

from ..priors.dataset import DatasetPrior

_DATA_DIR = os.path.join(os.path.dirname(__file__), "data")
N_BITS = 2048
BOND_RADIUS = 3


def _morgan_fingerprints(smiles_list) -> Optional[np.ndarray]:
    try:
        from rdkit.Chem import AllChem, MolFromSmiles
    except ImportError:
        return None
    fps = []
    for s in smiles_list:
        mol = MolFromSmiles(s)
        fps.append(np.asarray(
            AllChem.GetMorganFingerprintAsBitVect(mol, BOND_RADIUS,
                                                  nBits=N_BITS)))
    return np.asarray(fps, np.float32)


def _ngram_fingerprints(smiles_list, n_lo: int = 1, n_hi: int = 4
                        ) -> np.ndarray:
    """Hashed character-n-gram fallback fingerprint (2048 bits)."""
    out = np.zeros((len(smiles_list), N_BITS), np.float32)
    for i, s in enumerate(smiles_list):
        for n in range(n_lo, n_hi + 1):
            for j in range(len(s) - n + 1):
                h = zlib.crc32(s[j:j + n].encode()) % N_BITS
                out[i, h] = 1.0
    return out


def featurise_smiles(smiles_list) -> np.ndarray:
    fps = _morgan_fingerprints(smiles_list)
    if fps is None:
        fps = _ngram_fingerprints(smiles_list)
    return fps


def create_malaria_dataset(data_path: Optional[str] = None):
    """2048-bit fingerprints + negated EC50 activities
    (experiments/_generate_drug_dataset.py:7-33)."""
    path = data_path or os.path.join(_DATA_DIR, "malaria_box_dataset.csv")
    smiles, targets = [], []
    with open(path, encoding="utf-8-sig") as f:
        for row in csv.DictReader(f):
            smiles.append(row["Canonical_Smiles"])
            targets.append(float(row["Activity (EC50 uM)"]))
    features = featurise_smiles(smiles)
    true_targets = -np.asarray(targets, np.float32)  # maximize
    return jnp.asarray(features), jnp.asarray(true_targets)


def create_solvent_dataset(data_path: Optional[str] = None):
    """2048-bit fingerprints + dipole moments
    (experiments/_generate_drug_dataset.py:35-60)."""
    path = data_path or os.path.join(_DATA_DIR, "QM9_dipole.csv")
    smiles, targets = [], []
    with open(path, encoding="utf-8-sig") as f:
        for row in csv.DictReader(f):
            smiles.append(row["smiles"])
            targets.append(float(row["dipole"]))
    features = featurise_smiles(smiles)
    return jnp.asarray(features), jnp.asarray(np.asarray(targets, np.float32))


def _subsample(features, targets, n_pool, seed):
    """Budget knob for smoke/CI runs: a uniform subsample of the dataset
    pool keeps the end-to-end flow at a fraction of the full-pool sweep
    cost. n_pool=None (default) keeps the full dataset."""
    if n_pool is None or n_pool >= features.shape[0]:
        return features, targets
    idx = np.random.default_rng(seed).choice(
        features.shape[0], n_pool, replace=False)
    idx = jnp.asarray(np.sort(idx))
    return features[idx], targets[idx]


def setup_malaria(data_path: Optional[str] = None, n_pool: int = None,
                  seed: int = 0) -> DatasetPrior:
    """(experiments/_malaria.py:18-27)"""
    features, true_targets = create_malaria_dataset(data_path)
    features, true_targets = _subsample(features, true_targets, n_pool, seed)
    return DatasetPrior(features, true_targets)


def setup_solvent(data_path: Optional[str] = None, n_pool: int = None,
                  seed: int = 0) -> DatasetPrior:
    """(experiments/_solvent.py:18-27)"""
    features, true_targets = create_solvent_dataset(data_path)
    features, true_targets = _subsample(features, true_targets, n_pool, seed)
    return DatasetPrior(features, true_targets)
