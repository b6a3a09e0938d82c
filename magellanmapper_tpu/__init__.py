"""MagellanMapper-TPU: a TPU-native volumetric microscopy framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
sanderslab/magellanmapper (reference layout: ``magmap/``): whole-image 3D
blob (nuclei) detection, intensity-based atlas registration, atlas
curation/refinement, regional quantification, and large-image I/O.

Architecture (TPU-first, not a port):

- ``ops/``      pure JAX/Pallas kernels (LoG scale pyramid, local maxima,
                morphology, EDT, watershed, resampling, histograms).
- ``parallel/`` device-mesh runtime: block geometry, ``shard_map`` halo
                exchange over ICI, host->device streaming of memmap chunks.
- ``cv/``       detection domain: ``detect_blobs``, whole-stack block
                detection, pruning, verification, colocalization.
- ``atlas/``    registration engine (multi-resolution affine/B-spline with
                NCC/Mattes-MI losses as JAX optimization), atlas curation,
                ontology.
- ``stats/``    per-region quantification as segment reductions.
- ``io/``       host-side I/O: memmapped ``.npy``, TIF/RAW import,
                MHD/NRRD/NIfTI codecs, sqlite blob DB, CSV stats.
- ``models/``   Flax models (blob patch classifier).
- ``settings/`` profile system compatible with the reference's
                ROI/atlas/grid-search profile vocabulary.
"""

__version__ = "0.1.0"
