"""Command-plane + action-registry tests: the reference's 15 wss commands and
34-function DSL registry against the in-memory service bundle."""

import asyncio

import pytest

from imagined_speech_translation_tpu.runtime import (
    COMMAND_NAMES,
    DeviceChannel,
    Parser,
    ServiceBundle,
    TextFrame,
    UserActions,
    build_action_registry,
    build_command_registry,
)
from imagined_speech_translation_tpu.runtime.actions import REGISTRY_NAMES


def run(coro):
    return asyncio.run(coro)


@pytest.fixture()
def bundle():
    return ServiceBundle()


@pytest.fixture()
def registry(bundle):
    return build_command_registry(bundle)


async def _auth(reg):
    return await reg.dispatch(TextFrame("authentication", "user@example.com"))


def test_all_reference_commands_registered(registry):
    assert set(COMMAND_NAMES) <= set(registry._handlers)
    assert len(COMMAND_NAMES) == 15


def test_onboarding_flow(registry):
    async def flow():
        key = await _auth(registry)
        first = await registry.dispatch(TextFrame("first_time", key))
        assert first == {"first_time": True}
        again = await registry.dispatch(TextFrame("first_time", key))
        assert again == {"first_time": False}
        ble = await registry.dispatch(TextFrame("ble_id", key, ("AA:BB",)))
        assert ble["ble_id"] == "AA:BB"
        assert (await registry.dispatch(TextFrame("ble_id", key)))["ble_id"] == "AA:BB"

    run(flow())


def test_token_and_profile_commands(registry):
    async def flow():
        key = await _auth(registry)
        await registry.dispatch(TextFrame("auth_code", key, ("server-code",)))
        rt = await registry.dispatch(TextFrame("get_refresh_token", key))
        assert rt["refresh_token"].startswith("rt_")
        name = await registry.dispatch(TextFrame("get_display_name", key))
        assert name["display_name"] == "user@example.com"
        out = await registry.dispatch(TextFrame("add_query", key, ("my emails...",)))
        assert out["stored_chars"] > 0
        # send_data now includes the stored profile context
        resp = await registry.dispatch(TextFrame("send_data", key, ("你好",)))
        assert "你好" in resp["response"]

    run(flow())


def test_media_and_maps_commands(registry):
    async def flow():
        key = await _auth(registry)
        spoken = await registry.dispatch(TextFrame("speak", key, ("hello",)))
        assert spoken["pcm_bytes"] > 0
        song = await registry.dispatch(TextFrame("stream_song", key, ("song",)))
        assert song["audio_bytes"] > 0
        steps = await registry.dispatch(
            TextFrame("directions", key, ("Home", "Work"))
        )
        assert len(steps["steps"]) == 2
        place = await registry.dispatch(TextFrame("get_place", key, ("cafe",)))
        assert place["place"]["name"] == "cafe"
        vision = await registry.dispatch(TextFrame("vision", key, ("aGk=", "what")))
        assert "response" in vision

    run(flow())


# ---------------------------------------------------------------------------
# action registry (the DSL surface)
# ---------------------------------------------------------------------------


def test_registry_matches_reference_names(bundle):
    actions = UserActions(bundle, user_id="u1")
    registry = build_action_registry(actions)
    assert set(registry) == set(REGISTRY_NAMES)
    assert len(REGISTRY_NAMES) == 34


def test_dsl_drives_actions_end_to_end(bundle):
    device = DeviceChannel()
    actions = UserActions(bundle, device, user_id="u1")
    parser = Parser(build_action_registry(actions))

    async def flow():
        # the canonical LLM output shape: chained calls with nesting
        results = await parser.execute(
            "add_calendar_event(|Standup|,|2026-08-17T09:00|,|2026-08-17T09:15|)"
            "¬speak(|added |^get_calendar_events(|2026-08-17|))"
        )
        assert results[0].startswith("ev")
        assert "Standup" in results[1]
        # device got the audio
        kinds = [k for k, _ in device.sent]
        assert "audio" in kinds

        # tasks + email CRUD
        tid = (await parser.execute("add_task(|buy milk|)"))[0]
        assert "buy milk" in (await parser.execute("get_tasks()"))[0]
        await parser.execute(f"update_task(|{tid}|,|buy oat milk|)")
        assert "oat" in (await parser.execute("get_tasks()"))[0]
        assert (await parser.execute(f"delete_task(|{tid}|)"))[0] == "deleted"

        mid = (await parser.execute(
            "send_email(|a@b.c|,|Hi|,|body text|)"
        ))[0]
        assert mid in (await parser.execute("search_emails(|body|)"))[0]
        assert "body text" in (await parser.execute(f"read_email(|{mid}|)"))[0]

        # docs / sheets roundtrip
        await parser.execute("write_document(|notes|,|第一行|)")
        assert (await parser.execute("get_document(|notes|)"))[0] == "第一行"
        await parser.execute("write_sheet(|data|,|a,b\nc,d|)")
        assert (await parser.execute("get_sheet(|data|)"))[0] == "a,b\nc,d"

        # device controls
        assert (await parser.execute("change_volume(|80|)"))[0] == "volume 80"
        assert ("volume", 80) in device.sent
        assert (await parser.execute("call(|Mom|)"))[0] == "calling Mom"

    run(flow())


def test_calendar_update_delete(bundle):
    actions = UserActions(bundle, user_id="u1")
    parser = Parser(build_action_registry(actions))

    async def flow():
        eid = (await parser.execute(
            "add_calendar_event(|Gym|,|2026-08-18T18:00|,|2026-08-18T19:00|)"
        ))[0]
        await parser.execute(f"update_calendar_event(|{eid}|,|Gym + Sauna|)")
        assert "Sauna" in (await parser.execute("get_calendar_events()"))[0]
        assert (await parser.execute(f"delete_calendar_event(|{eid}|)"))[0] == "deleted"
        assert (await parser.execute("get_calendar_events()"))[0] == "no events"

    run(flow())
