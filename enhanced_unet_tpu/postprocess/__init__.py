"""Host-side post-processing: semantic mask -> instances.

Inherently sequential/dynamic morphology (SURVEY §7): stays on the host by
design; it runs on small eval batches, never in the training hot path.
"""

from enhanced_unet_tpu.postprocess.instances import semantic_to_instances

__all__ = ["semantic_to_instances"]
