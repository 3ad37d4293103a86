"""LLM/VLM fine-grained labelers (reference L7 side-channel).

Re-implements the three labeling backends behind one interface:
- ``OpenAILabeler`` — GPT-4o over base64 frames (model/chatgpt4o_api.py:57-158).
  API key ONLY from env ``OPENAI_API_KEY`` (the reference embeds a key in
  source — COMPAT.md #12).
- ``LlavaLabeler`` — local LLaVA via transformers (model/llava_api_eval.py:11-40).
- ``VideoToLabelLLM`` — Llama-2 with video embeddings projected into the LLM
  embedding space (model/llm.py:10-64).

All backends require weights/network unavailable in this image, so every
import/construction is gated; ``get_fine_grained_labels`` is the call-site
API the transformer's (commented) L3-labeling hook expects
(transformer.py:79-108).
"""

from __future__ import annotations

import base64
import os
from typing import List, Optional, Sequence, Tuple

from r3d_tpu.utils.prompts import parse_answer


class OpenAILabeler:
    """GPT-4o frame labeler. Needs OPENAI_API_KEY in the environment."""

    def __init__(self, model: str = "gpt-4o", max_frames: int = 20):
        key = os.environ.get("OPENAI_API_KEY")
        if not key:
            raise RuntimeError("OPENAI_API_KEY not set (keys never live in code)")
        try:
            from openai import OpenAI  # pragma: no cover - env gated
        except ImportError as e:
            raise RuntimeError("openai package not installed") from e
        self._client = OpenAI(api_key=key)
        self.model = model
        self.max_frames = max_frames

    @staticmethod
    def _encode(path: str) -> str:
        with open(path, "rb") as f:
            return base64.b64encode(f.read()).decode()

    def get_fine_grained_labels(
        self, frame_paths: Sequence[str], prompt: str
    ) -> Tuple[str, List[int]]:
        frames = list(frame_paths)[: self.max_frames]
        content = [{"type": "text", "text": prompt}] + [
            {
                "type": "image_url",
                "image_url": {"url": f"data:image/png;base64,{self._encode(p)}"},
            }
            for p in frames
        ]
        resp = self._client.chat.completions.create(
            model=self.model, messages=[{"role": "user", "content": content}]
        )
        answer = resp.choices[0].message.content or ""
        return answer, parse_answer(answer, len(frame_paths))


class LlavaLabeler:
    """Local LLaVA labeler (needs transformers weights cached locally)."""

    def __init__(self, model_name: str = "llava-hf/llava-1.5-7b-hf"):
        try:  # pragma: no cover - env gated
            import torch
            from transformers import AutoProcessor, LlavaForConditionalGeneration
        except ImportError as e:
            raise RuntimeError("LlavaLabeler requires transformers+torch") from e
        self._torch = torch
        self.processor = AutoProcessor.from_pretrained(model_name)
        self.model = LlavaForConditionalGeneration.from_pretrained(model_name)

    def get_fine_grained_labels(
        self, frame_paths: Sequence[str], prompt: str, max_new_tokens: int = 256
    ) -> Tuple[str, List[int]]:
        from PIL import Image

        images = [Image.open(p) for p in frame_paths]
        inputs = self.processor(text=prompt, images=images, return_tensors="pt")
        with self._torch.no_grad():
            out = self.model.generate(**inputs, max_new_tokens=max_new_tokens)
        answer = self.processor.decode(out[0], skip_special_tokens=True)
        return answer, parse_answer(answer, len(frame_paths))


class VideoToLabelLLM:
    """Llama-2 conditioned on projected video embeddings (model/llm.py:10-64):
    a linear projection maps per-frame features into the LLM's token-embedding
    space; generation is prompted with [projected frames; prompt tokens]."""

    def __init__(self, model_name: str = "meta-llama/Llama-2-7b-hf",
                 video_dim: int = 2048, model=None, tokenizer=None):
        """``model``/``tokenizer`` inject a pre-built causal LM (tests use a
        tiny random-config Llama; production loads the named checkpoint)."""
        try:
            import torch
            from transformers import AutoModelForCausalLM, AutoTokenizer
        except ImportError as e:  # pragma: no cover - env gated
            raise RuntimeError("VideoToLabelLLM requires transformers+torch") from e
        self._torch = torch
        self.tokenizer = (
            tokenizer if tokenizer is not None
            else AutoTokenizer.from_pretrained(model_name)
        )
        self.model = (
            model if model is not None
            else AutoModelForCausalLM.from_pretrained(model_name)
        )
        hidden = self.model.config.hidden_size
        self.projection = torch.nn.Linear(video_dim, hidden)

    def forward(self, video_embedding, human_prompt: str, max_new_tokens: int = 128):
        torch = self._torch
        vid = self.projection(video_embedding)                  # [T, H]
        tokens = self.tokenizer(human_prompt, return_tensors="pt")
        tok_emb = self.model.get_input_embeddings()(tokens.input_ids)[0]
        inputs_embeds = torch.cat([vid, tok_emb], dim=0)[None]
        out = self.model.generate(
            inputs_embeds=inputs_embeds, max_new_tokens=max_new_tokens
        )
        return self.tokenizer.decode(out[0], skip_special_tokens=True)


def make_labeler(backend: str = "openai", **kw):
    if backend == "openai":
        return OpenAILabeler(**kw)
    if backend == "llava":
        return LlavaLabeler(**kw)
    if backend == "llama":
        return VideoToLabelLLM(**kw)
    raise ValueError(f"unknown labeler backend {backend!r}")
