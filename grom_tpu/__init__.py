"""grom_tpu — a TPU-native integrated germline variant caller.

Reimplements the capabilities of GROM (radygenomics/GROM: SNVs, small indels,
structural variants, CNVs and translocations from coordinate-sorted paired-end
BAMs) as an idiomatic JAX/XLA/Pallas engine: host-side BAM→tensor ingest,
vectorized pileup/evidence kernels over HBM-resident genome tiles, and
mesh-sharded multi-chip execution.
"""

from grom_tpu.config import DerivedConfig, GromConfig

__version__ = "0.1.0"

__all__ = ["GromConfig", "DerivedConfig", "__version__"]
