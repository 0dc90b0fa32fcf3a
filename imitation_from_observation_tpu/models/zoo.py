"""Model registry.

The reference zoo (arm_shaping.py) holds 17 encoder/translator/decoder
variants; three are load-bearing (used by the launchers and reward engine):
ContextSkipNew, ContextAEReal, ContextAEInception2 — here ``context_skip``,
``context_small``, ``context_feat``. The remaining variants are experimental
ablations of the same family; they are being added incrementally.
"""

from __future__ import annotations

from typing import Any

from imitation_from_observation_tpu.core.config import TranslationModelConfig
from imitation_from_observation_tpu.models.context import (
    ContextFeat,
    ContextSkip,
    ContextSmall,
)

MODEL_REGISTRY: dict[str, Any] = {}


def register(name: str):
    def deco(fn):
        MODEL_REGISTRY[name] = fn
        return fn

    return deco


@register("context_skip")
def _context_skip(cfg: TranslationModelConfig) -> ContextSkip:
    return ContextSkip(
        base_filters=cfg.base_filters,
        feat_size=cfg.feat_size,
        image_size=tuple(cfg.image_size),
        channels=cfg.channels,
    )


@register("context_small")
def _context_small(cfg: TranslationModelConfig) -> ContextSmall:
    return ContextSmall(
        feat_size=cfg.feat_size if cfg.feat_size != 1024 else 100,
        image_size=tuple(cfg.image_size),
        channels=cfg.channels,
        dropout_rate=cfg.dropout_rate,
    )


@register("context_feat")
def _context_feat(cfg: TranslationModelConfig) -> ContextFeat:
    return ContextFeat(
        strides=tuple(cfg.strides),
        kernels=tuple(cfg.kernels),
        filters=tuple(cfg.filters),
        feat_size=cfg.feat_size,
        feature_hw=tuple(cfg.feature_hw) if cfg.feature_hw else (8, 8),
        feature_channels=cfg.feature_channels or 2048,
    )


def _register_variants() -> None:
    from imitation_from_observation_tpu.models.zoo_variants import (
        CONTEXT_VARIANTS,
        ContextAEInceptionVariant,
        ContextVanillaDropVariant,
    )

    def make(name: str, cls: type):
        @register(name)
        def _build(cfg: TranslationModelConfig, _cls=cls):
            if _cls is ContextAEInceptionVariant:
                # feature-map model: dedicated config fields, reference
                # defaults when unset (df_dim 256, 8x8x2048 Mixed_7c maps,
                # arm_shaping.py:1686-1694)
                return _cls(
                    base_filters=cfg.feature_filters or 256,
                    feat_size=cfg.feat_size,
                    feature_hw=tuple(cfg.feature_hw) if cfg.feature_hw else (8, 8),
                    feature_channels=cfg.feature_channels or 2048,
                )
            kwargs = dict(
                base_filters=cfg.base_filters,
                feat_size=cfg.feat_size,
                image_size=tuple(cfg.image_size),
                channels=cfg.channels,
            )
            if _cls is ContextVanillaDropVariant:
                kwargs["dropout_rate"] = cfg.dropout_rate
            return _cls(**kwargs)

    for name, cls in CONTEXT_VARIANTS.items():
        make(name, cls)


_register_variants()


def build_model(cfg: TranslationModelConfig):
    if cfg.model not in MODEL_REGISTRY:
        raise KeyError(f"unknown model {cfg.model!r}; have {sorted(MODEL_REGISTRY)}")
    return MODEL_REGISTRY[cfg.model](cfg)
