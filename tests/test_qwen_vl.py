"""VL prompt-expander plumbing (reference wan/utils/qwen_vl_utils.py +
prompt_extend.py VL paths)."""
import base64
from io import BytesIO

import pytest

from self_forcing_tpu import qwen_vl
from self_forcing_tpu.prompt_extend import (QwenPromptExpander,
                                            VL_EN_SYS_PROMPT)


def _img(w=100, h=60, color=(200, 30, 30)):
    from PIL import Image
    return Image.new("RGB", (w, h), color)


def test_factor_rounding():
    assert qwen_vl.round_by_factor(29, 28) == 28
    assert qwen_vl.ceil_by_factor(29, 28) == 56
    assert qwen_vl.floor_by_factor(55, 28) == 28


def test_smart_resize_properties():
    for h0, w0 in [(60, 100), (1080, 1920), (28, 28), (5000, 40)]:
        h, w = qwen_vl.smart_resize(h0, w0)
        assert h % qwen_vl.IMAGE_FACTOR == 0
        assert w % qwen_vl.IMAGE_FACTOR == 0
        assert qwen_vl.MIN_PIXELS <= h * w <= qwen_vl.MAX_PIXELS
    # Aspect preserved within a factor-rounding tolerance at big sizes.
    h, w = qwen_vl.smart_resize(1080, 1920)
    assert abs(h / w - 1080 / 1920) < 0.05
    with pytest.raises(ValueError):
        qwen_vl.smart_resize(10, 10 * (qwen_vl.MAX_RATIO + 1))


def test_fetch_image_sources(tmp_path):
    img = _img()
    out = qwen_vl.fetch_image({"image": img})
    assert out.size[0] % 28 == 0 and out.size[1] % 28 == 0

    p = tmp_path / "x.png"
    img.save(p)
    assert qwen_vl.fetch_image({"image": str(p)}).mode == "RGB"
    assert qwen_vl.fetch_image({"image": f"file://{p}"}).size == out.size

    buf = BytesIO()
    img.save(buf, format="PNG")
    uri = "data:image/png;base64," + base64.b64encode(
        buf.getvalue()).decode()
    assert qwen_vl.fetch_image({"image": uri}).size == out.size

    # Explicit resize override takes priority.
    out2 = qwen_vl.fetch_image({"image": img, "resized_height": 56,
                                "resized_width": 84})
    assert out2.size == (84, 56)


def test_smart_nframes():
    assert qwen_vl.smart_nframes({"nframes": 7}, 100, 30.0) == 8
    # 100 frames @30fps sampled at 2fps -> ~6.7 -> round to factor 2.
    assert qwen_vl.smart_nframes({}, 100, 30.0) == 6
    assert qwen_vl.smart_nframes({"fps": 30.0}, 10, 30.0) == 10
    with pytest.raises(ValueError):
        qwen_vl.smart_nframes({"nframes": 4, "fps": 2.0}, 100, 30.0)
    with pytest.raises(ValueError):
        qwen_vl.smart_nframes({"nframes": 200}, 100, 30.0)


def test_fetch_video_frame_list_pads_to_factor():
    frames = qwen_vl.fetch_video({"video": [_img(), _img(), _img()]})
    assert len(frames) % qwen_vl.FRAME_FACTOR == 0
    assert len(frames) == 4
    assert frames[-1].size == frames[-2].size


def test_process_vision_info():
    msgs = [
        {"role": "system", "content": [{"type": "text", "text": "s"}]},
        {"role": "user", "content": [
            {"type": "image", "image": _img()},
            {"type": "text", "text": "hi"},
        ]},
    ]
    images, videos = qwen_vl.process_vision_info(msgs)
    assert videos is None and len(images) == 1
    assert images[0].size[0] % 28 == 0

    none_imgs, none_vids = qwen_vl.process_vision_info(
        [{"role": "user", "content": "plain text"}])
    assert none_imgs is None and none_vids is None


def test_vl_expander_dispatch_and_fallback():
    exp = QwenPromptExpander(model_name="/nonexistent/vl-model", is_vl=True)
    assert exp.decide_system_prompt("en") == VL_EN_SYS_PROMPT
    out = exp("a dog", tar_lang="en", image=_img())
    # No weights -> template fallback, but the call path is the VL one.
    assert out.status and "a dog" in out.prompt
    assert out.system_prompt == VL_EN_SYS_PROMPT
    # Without an image a VL expander still extends as text.
    out2 = exp("a cat")
    assert out2.status and "a cat" in out2.prompt


def test_vl_model_dict_shorthand():
    exp = QwenPromptExpander(model_name="QwenVL2.5_3B", is_vl=True)
    assert exp.model_name == "Qwen/Qwen2.5-VL-3B-Instruct"
    assert QwenPromptExpander(is_vl=True).model_name.startswith(
        "Qwen/Qwen2.5-VL")
    assert QwenPromptExpander().model_name == "Qwen/Qwen2.5-3B-Instruct"
