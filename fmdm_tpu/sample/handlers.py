"""
Sampler class hierarchy + model handlers.

Public-API parity with the reference
(/root/reference/src/pipelines/samplers/abstract/*.py, concrete/*.py,
handlers/*.py): BaseSampler -> AbstractSampler -> DiffusionLikeSampler /
VAESampler; ModelHandler with a lazy ``sampler`` property; thin
VAEHandler/DiffusionHandler/FlowMatchingHandler. Users call e.g.
``VAEHandler(ckpt_dir=...).sample()/.encode()/.decode()/.evaluate()``.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, Optional

from fmdm_tpu.sample import autoencoder_like, diffusion_like
from fmdm_tpu.sample.sampling_utils import build_tensor_cache_from_config, load_run_config


class BaseSampler:
    """Runtime state holder + tensor-cache build (abstract/sampler.py:14-77)."""

    def __init__(self, **kwargs):
        self.options: Dict[str, Any] = dict(kwargs)
        self.ckpt_dir = Path(kwargs["ckpt_dir"])

    def build_tensor_cache(self) -> int:
        cfg = load_run_config(self.ckpt_dir)
        return build_tensor_cache_from_config(
            cfg,
            self.options.get("data_txt"),
            int(self.options.get("batch_size", 4)),
            int(self.options.get("seed", 42)),
            self.options.get("num_samples"),
        )


class AbstractSampler(BaseSampler):
    """encode/decode/sample/evaluate contract (abstract/sampler.py:79-98)."""

    def encode(self):
        raise NotImplementedError

    def decode(self):
        raise NotImplementedError

    def sample(self):
        raise NotImplementedError

    def evaluate(self):
        raise NotImplementedError

    def debug_compare(self):
        raise NotImplementedError


class AbstractAutoencoderSampler(AbstractSampler):
    """Marker base for autoencoder-style samplers."""


class DiffusionLikeSampler(AbstractSampler):
    """Delegates to the diffusion_like engine; sample() == decode()
    (concrete/diffusion_like.py:11-99)."""

    def __init__(self, model_type: str, **kwargs):
        super().__init__(**kwargs)
        self.model_type = model_type

    def _common(self, keys):
        return {k: self.options.get(k) for k in keys if k in self.options}

    def encode(self):
        return diffusion_like._run_encode(
            model_type=self.model_type,
            **self._common(("ckpt_dir", "data_txt", "save", "output_dir", "batch_size",
                            "device", "seed", "timestep", "num_samples", "save_tensor_cache")),
        )

    def decode(self):
        return diffusion_like._run_decode(
            model_type=self.model_type,
            **self._common(("ckpt_dir", "data_txt", "save", "output_dir", "batch_size",
                            "device", "seed", "num_samples", "save_input", "save_conditioning",
                            "num_inference_steps", "start_step", "last_n_steps", "scheduler",
                            "save_tensor_cache", "latent_vae")),
        )

    def sample(self):
        return self.decode()

    def evaluate(self):
        return diffusion_like._run_evaluate(
            model_type=self.model_type,
            **self._common(("ckpt_dir", "data_txt", "save", "output_dir", "batch_size",
                            "device", "seed", "num_samples", "save_input", "save_conditioning",
                            "num_inference_steps", "start_step", "last_n_steps", "scheduler",
                            "save_tensor_cache", "latent_vae")),
        )

    def debug_compare(self):
        return diffusion_like._run_debug_compare(
            model_type=self.model_type,
            **self._common(("ckpt_dir", "data_txt", "output_dir", "device", "seed",
                            "num_samples", "num_inference_steps", "start_step",
                            "last_n_steps", "scheduler", "save_tensor_cache")),
        )


class VAESampler(AbstractAutoencoderSampler):
    """Delegates to the autoencoder_like engine (concrete/vae.py:11-80)."""

    def encode(self):
        return autoencoder_like.encode(**self.options)

    def decode(self):
        return autoencoder_like.decode(**self.options)

    def sample(self):
        return autoencoder_like.sample(**self.options)

    def evaluate(self):
        return autoencoder_like.evaluate(**self.options)

    def debug_compare(self):
        return autoencoder_like.debug_compare(**self.options)


class ModelHandler:
    """Lazy-sampler handler base (handlers/base.py:11-98)."""

    sampler_cls = None
    model_type: Optional[str] = None

    def __init__(self, ckpt_dir, **kwargs):
        self._options = dict(kwargs)
        self._options["ckpt_dir"] = Path(ckpt_dir)
        self._sampler = None

    def create_sampler(self):
        if self.model_type is not None:
            return self.sampler_cls(model_type=self.model_type, **self._options)
        return self.sampler_cls(**self._options)

    @property
    def sampler(self):
        if self._sampler is None:
            self._sampler = self.create_sampler()
        return self._sampler

    def encode(self):
        return self.sampler.encode()

    def decode(self):
        return self.sampler.decode()

    def sample(self):
        return self.sampler.sample()

    def evaluate(self):
        return self.sampler.evaluate()

    def build_tensor_cache(self):
        return self.sampler.build_tensor_cache()

    def debug_compare(self):
        return self.sampler.debug_compare()


class VAEHandler(ModelHandler):
    sampler_cls = VAESampler
    model_type = None


class DiffusionHandler(ModelHandler):
    sampler_cls = DiffusionLikeSampler
    model_type = "diffusion"


class FlowMatchingHandler(ModelHandler):
    sampler_cls = DiffusionLikeSampler
    model_type = "flow_matching"


# Reference alias (samplers/concrete exports AutoencoderSampler alongside
# VAESampler)
AutoencoderSampler = VAESampler
