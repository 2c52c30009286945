from kotoba_whisper_tpu.core.config import WhisperConfig, SpecialTokens, PRESETS
from kotoba_whisper_tpu.core.mesh import MeshConfig, build_mesh, shardings_for_params
