"""Prompt extension (reference wan/utils/prompt_extend.py: Dashscope API
or local Qwen expanders that rewrite short prompts into detailed ones).

TPU build: the Dashscope path needs network (gated); the local path uses
any HF causal LM via transformers when weights are present.  Without
either, extension degrades to a deterministic template expansion so
pipelines keep working (the reference treats extension as optional,
wan/text2video.py prompt handling).
"""
from __future__ import annotations

import dataclasses
import os
from typing import Optional

LM_EN_SYS_PROMPT = (
    "You are a prompt engineer for a text-to-video model. Rewrite the "
    "user's prompt into a single detailed English description of the "
    "scene: subjects, appearance, motion, camera, lighting, style. "
    "Output only the rewritten prompt.")

LM_ZH_SYS_PROMPT = (
    "你是一个视频生成提示词工程师。请将用户的提示词改写为一个详细的中文视频"
    "描述：主体、外观、动作、镜头、光线、风格。只输出改写后的提示词。")


@dataclasses.dataclass
class PromptOutput:
    status: bool
    prompt: str
    seed: int = -1
    system_prompt: str = ""
    message: str = ""


class PromptExpander:
    """Base interface (prompt_extend.py's PromptExpander)."""

    def __init__(self, model_name: Optional[str] = None, is_vl: bool = False,
                 **kwargs):
        self.model_name = model_name
        self.is_vl = is_vl

    def extend(self, prompt: str, system_prompt: Optional[str] = None,
               seed: int = -1) -> PromptOutput:
        raise NotImplementedError

    def decide_system_prompt(self, tar_lang: str = "en") -> str:
        return LM_ZH_SYS_PROMPT if tar_lang == "zh" else LM_EN_SYS_PROMPT

    def __call__(self, prompt: str, tar_lang: str = "en",
                 seed: int = -1) -> PromptOutput:
        return self.extend(prompt, self.decide_system_prompt(tar_lang),
                           seed)


class QwenPromptExpander(PromptExpander):
    """Local HF causal-LM expander (prompt_extend.py's QwenPromptExpander).

    Loads lazily; if the model cannot load (no weights / no network) the
    template fallback keeps the pipeline functional.
    """

    def __init__(self, model_name: str = "Qwen/Qwen2.5-3B-Instruct",
                 **kwargs):
        super().__init__(model_name, **kwargs)
        self._model = None
        self._tokenizer = None
        self._available = None

    def _load(self) -> bool:
        if self._available is not None:
            return self._available
        try:
            from transformers import (AutoModelForCausalLM, AutoTokenizer)
            self._tokenizer = AutoTokenizer.from_pretrained(self.model_name)
            self._model = AutoModelForCausalLM.from_pretrained(
                self.model_name)
            self._available = True
        except Exception:
            self._available = False
        return self._available

    def extend(self, prompt: str, system_prompt: Optional[str] = None,
               seed: int = -1) -> PromptOutput:
        system_prompt = system_prompt or LM_EN_SYS_PROMPT
        if self._load():
            messages = [{"role": "system", "content": system_prompt},
                        {"role": "user", "content": prompt}]
            text = self._tokenizer.apply_chat_template(
                messages, tokenize=False, add_generation_prompt=True)
            inputs = self._tokenizer([text], return_tensors="pt")
            out = self._model.generate(**inputs, max_new_tokens=256,
                                       do_sample=seed != -1)
            new = self._tokenizer.decode(
                out[0][inputs["input_ids"].shape[1]:],
                skip_special_tokens=True).strip()
            return PromptOutput(True, new or prompt, seed, system_prompt)
        return template_extend(prompt, seed=seed,
                               system_prompt=system_prompt)


class DashScopePromptExpander(PromptExpander):
    """Dashscope API expander (prompt_extend.py's DashScopePromptExpander);
    requires network + DASH_API_KEY."""

    def extend(self, prompt: str, system_prompt: Optional[str] = None,
               seed: int = -1) -> PromptOutput:
        system_prompt = system_prompt or LM_EN_SYS_PROMPT
        try:
            import dashscope
            dashscope.api_key = os.environ["DASH_API_KEY"]
            rsp = dashscope.Generation.call(
                self.model_name or "qwen-plus",
                messages=[{"role": "system", "content": system_prompt},
                          {"role": "user", "content": prompt}],
                result_format="message", seed=max(seed, 0))
            new = rsp.output.choices[0].message.content.strip()
            return PromptOutput(True, new, seed, system_prompt)
        except Exception as e:  # noqa: BLE001
            return PromptOutput(False, prompt, seed, system_prompt, str(e))


_TEMPLATE = ("{prompt}. Cinematic shot with natural motion, detailed "
             "textures, coherent subject movement, realistic lighting and "
             "shadows, smooth camera work, high visual fidelity.")


def template_extend(prompt: str, seed: int = -1,
                    system_prompt: str = "") -> PromptOutput:
    """Deterministic offline fallback: decorate the prompt with the style
    suffix the expanders converge on."""
    p = prompt.strip().rstrip(".")
    return PromptOutput(True, _TEMPLATE.format(prompt=p), seed,
                        system_prompt, "template fallback")
