"""Vectorized NumPy kernels re-expressing the reference's function surface.

Modules:
  numutil    -- exact percentile / segment-reduce primitives
  stats      -- caits/fe/_statistical.py equivalents
  preprocess -- caits/preprocessing.py + _core_fix equivalents
  filters    -- caits/filtering.py equivalents (pure NumPy; no SciPy here)
  augment    -- caits/augmentation/_augment_1d.py equivalents (seeded)
  spectral   -- caits/fe/_spectrum.py equivalents (NumPy rfft)
  text       -- engine-new: tokenize / lang-id / quality / fingerprints
  vector     -- engine-new: cosine top-k, LSH, minhash/simhash kernels
"""
