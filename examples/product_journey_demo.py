"""Full product journey, one process, printed as a transcript.

The reference user story end-to-end (SURVEY.md §3.5 + ``app/lib``):
sign-in with first-login personalization → BLE pairing → device state push
→ WiFi provisioning (settings page creds over BLE + QR payload) → imagined
speech: EEG frames through the REAL preprocess→encode→beam-decode pipeline
(tiny random-weight model; swap ``--ckpt`` for trained weights) → decoded
text back to the companion → capture saved to the Drive-backed recordings
folder, then browsed/downloaded — the device page's media surface
(``app/lib/pages/device.dart:87-117``) and settings panel
(``settings.dart``).

    python examples/product_journey_demo.py [--platform cpu] \
        [--transcript PATH]

Writes the transcript to stdout and (``--transcript``) to a file.
"""

from __future__ import annotations

import argparse
import asyncio
import json
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

LINES: list[str] = []


def say(actor: str, msg: str) -> None:
    line = f"[{time.strftime('%H:%M:%S')}] {actor:>10} | {msg}"
    LINES.append(line)
    print(line, flush=True)


def build_tiny_decode_fn(n_ch: int, window: int):
    """Real preprocess→encode→beam-decode program on a tiny random model."""
    import jax
    import jax.numpy as jnp  # noqa: F401

    from imagined_speech_translation_tpu.cli.serve import build_decode_fn
    from imagined_speech_translation_tpu.config import (
        AugmentationConfig,
        BartConfig,
        BrainEncoderConfig,
        Config,
        DataConfig,
        GenerationConfig,
        ModelConfig,
        RegionEncoderConfig,
    )
    from imagined_speech_translation_tpu.data import ChineseCharTokenizer
    from imagined_speech_translation_tpu.data.regions import RegionSpec
    from imagined_speech_translation_tpu.data.synthetic import (
        make_synthetic_montage,
    )
    from imagined_speech_translation_tpu.models import EEGDecodingModel

    vocab = (
        ["[PAD]"]
        + [f"[unused{i}]" for i in range(99)]
        + ["[UNK]", "[CLS]", "[SEP]", "[MASK]", "[EOS]"]
        + list("我想喝水请帮打开窗户今天气很好")
    )
    tok = ChineseCharTokenizer(
        list(dict.fromkeys(vocab)), eos_token="[EOS]"
    )
    h = 48
    cfg = Config(
        data=DataConfig(
            n_timepoints=window, max_length=8,
            augmentation=AugmentationConfig(enabled=False),
        ),
        model=ModelConfig(
            hidden_dim=h, max_region_channels=16,
            region_channel_counts=(16, 9, 11, 12),
            brain_encoder=BrainEncoderConfig(
                hidden_dim=h, fusion_heads=4, cross_region_heads=4,
                region_encoder=RegionEncoderConfig(
                    conv_channels=(8, 16, 24, 32, 48),
                    attn_heads=(4, 2, 2), se_reduction=4,
                ),
            ),
            bart=BartConfig(
                vocab_size=tok.vocab_size, d_model=h, encoder_layers=2,
                decoder_layers=2, num_heads=4, ffn_dim=96,
                max_position_embeddings=32,
                pad_token_id=tok.pad_token_id,
                bos_token_id=tok.bos_token_id,
                eos_token_id=tok.eos_token_id,
                decoder_start_token_id=tok.bos_token_id,
            ),
        ),
        generation=GenerationConfig(max_length=8, min_length=2, num_beams=2),
    ).validate()

    with tempfile.TemporaryDirectory() as d:
        labels = make_synthetic_montage(Path(d) / "m.csv", n_channels=n_ch)
    spec = RegionSpec.from_channel_names(labels)
    model = EEGDecodingModel(cfg.model)
    import jax.numpy as jnp

    mask = jnp.asarray(spec.channel_mask)
    variables = jax.jit(model.init)(
        jax.random.key(0),
        jnp.zeros((2, 4, 16, window), jnp.float32),
        jnp.zeros((2, 4), jnp.int32),
        mask,
    )
    return build_decode_fn(cfg, tok, spec, variables)


async def journey(args) -> dict:
    from imagined_speech_translation_tpu.companion import (
        CompanionClient,
        Contact,
        InMemoryBle,
        InMemoryPhone,
        InProcessTransport,
        LocalDirDrive,
        PhoneActions,
        Preferences,
        RecordingsBrowser,
        SettingsPanel,
        is_online,
    )
    from imagined_speech_translation_tpu.companion.ble import pair
    from imagined_speech_translation_tpu.runtime import (
        DecodePipeline,
        RingBuffer,
        SessionRegistry,
        Windower,
    )
    from imagined_speech_translation_tpu.runtime.commands import (
        build_command_registry,
    )
    from imagined_speech_translation_tpu.runtime.personalization import (
        parse_wifi_qr,
        wifi_qr_payload,
    )
    from imagined_speech_translation_tpu.runtime.server import WssService
    from imagined_speech_translation_tpu.runtime.services import ServiceBundle

    n_ch, window = 125, args.window

    say("demo", "compiling the decode pipeline (tiny random weights)...")
    decode_fn = build_tiny_decode_fn(n_ch, window)

    bundle = ServiceBundle()
    registry = build_command_registry(bundle, registry=SessionRegistry())
    svc = WssService(
        registry, services=bundle,
        pipeline_factory=lambda key: DecodePipeline(
            windower=Windower(
                RingBuffer(n_ch, 8 * window), window=window, hop=window
            ),
            decode_fn=decode_fn, max_batch=4,
        ),
        n_channels=n_ch,
    )

    workdir = Path(args.workdir or tempfile.mkdtemp(prefix="ist_journey_"))
    prefs = Preferences(workdir / "prefs.json")
    link_box: dict = {}

    async def device_write(frame: str):
        await link_box["link"].write_data(frame)

    client = CompanionClient(
        InProcessTransport(svc), prefs, device_write=device_write
    )

    # -- 1. sign in (first login uploads the personalization corpus) ------
    docs = [f"note {i}: the user likes tea 用户喜欢喝茶" for i in range(60)]
    key = await client.sign_in(
        "demo-google-id-token", server_auth_code="sac-demo",
        email="ada@example.com", documents=docs,
    )
    say("companion", f"signed in; access key {key[:8]}… ; uploaded "
        f"{len(docs)} personalization documents in batches of 50")

    # -- 2. pair the glasses over BLE --------------------------------------
    await client.set_ble_id("GLASSES-DEMO")
    radio = InMemoryBle(devices={"GLASSES-DEMO": object()})
    link = await pair(radio, ble_id="GLASSES-DEMO", auth_key=key, prefs=prefs)
    assert link is not None and link.connected
    link.phone = PhoneActions(
        InMemoryPhone(contacts=(Contact("Ada", ("+44 20 7946 0000",)),)),
        auth_key=key, write_data=link.write_data,
    )
    link_box["link"] = link
    say("companion", "paired with GLASSES-DEMO over BLE")

    await radio.emit_notify(f"ip|{key}|192.168.1.77".encode())
    await radio.emit_notify(f"battery|{key}|83".encode())
    say("glasses", "pushed state: ip=192.168.1.77 battery=83%")

    # -- 3. provision WiFi: settings page creds over BLE + the QR payload --
    panel = SettingsPanel(client)
    info = await panel.user_info()
    say("settings", f"user: {info['display_name']} <{info['email']}> ; "
        f"device: {panel.device_info()['model']}")
    await panel.connect_wifi("HomeNet", "hunter2")
    say("settings", f"sent over BLE: {radio.written[-1].decode()!r}")
    qr = wifi_qr_payload("HomeNet", "hunter2")
    assert parse_wifi_qr(qr)["ssid"] == "HomeNet"
    say("settings", f"QR fallback payload renders: {qr}")

    async def ok_get(url, timeout):
        say("wifi", f"liveness probe {url} -> 200")
        return 200

    assert await is_online(prefs, http_get=ok_get)

    # -- 4. speak: EEG frames through the real decode pipeline -------------
    rng = np.random.default_rng(7)
    eeg = rng.normal(size=(n_ch, 2 * window)).astype(np.float32)
    say("glasses", f"streaming EEG: {eeg.shape[0]} channels x "
        f"{eeg.shape[1]} samples")
    t0 = time.perf_counter()
    texts = await svc.handle_binary(
        b"eeg|" + key.encode() + b"|" + eeg.tobytes()
    )
    texts += await svc.handle_binary(b"eeg_end|" + key.encode() + b"|")
    dt = time.perf_counter() - t0
    for t in texts:
        say("decoder", f"utterance: {t!r}")
    say("decoder", f"{len(texts)} windows decoded in {dt:.2f}s")

    # -- 5. the capture lands in the recordings folder; browse it ----------
    browser = RecordingsBrowser(LocalDirDrive(workdir / "drive"))
    clip = b"RIFFAVI-DEMO" + eeg[:2, :16].tobytes()
    meta = await browser.save_recording("capture_0001.avi", clip)
    say("device", f"saved recording {meta['name']} ({meta['size']} bytes) "
        f"to '{browser.folder_name}'")
    listing = await browser.list_recordings()
    say("companion", "recordings: " + json.dumps(
        [{"name": f["name"], "size": f["size"]} for f in listing]
    ))
    say("companion", f"folder url: {await browser.folder_url()}")
    dest = await browser.download_to(meta["id"], workdir / "download.avi")
    assert dest.read_bytes() == clip
    say("companion", f"downloaded {meta['name']} -> {dest}")

    # -- 6. settings get/set persist; sign out ------------------------------
    panel.set("volume", 6)
    say("settings", f"persisted store: {json.dumps(panel.all())}")
    panel.sign_out()
    say("companion", "signed out (logged=false)")

    return {"utterances": texts, "recordings": len(listing),
            "workdir": str(workdir)}


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None)
    ap.add_argument("--window", type=int, default=128)
    ap.add_argument("--workdir", default=None)
    ap.add_argument("--transcript", default=None)
    args = ap.parse_args(argv)
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    result = asyncio.run(journey(args))
    say("demo", f"journey complete: {json.dumps(result)}")
    if args.transcript:
        Path(args.transcript).write_text("\n".join(LINES) + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
