"""Slack-webhook notifications (reference ``magmap/cloud/notify.py:16``)."""

from __future__ import annotations

import json
import logging
import urllib.request
from typing import Optional

_logger = logging.getLogger(__name__)


def notify(
        webhook_url: str, msg: str, attachment: Optional[str] = None,
        timeout: float = 10.0) -> bool:
    """POST a message to a Slack-compatible webhook."""
    payload = {"text": msg}
    if attachment:
        payload["attachments"] = [{"text": attachment}]
    req = urllib.request.Request(
        webhook_url, data=json.dumps(payload).encode("utf-8"),
        headers={"Content-Type": "application/json"})
    try:
        with urllib.request.urlopen(req, timeout=timeout) as resp:
            ok = resp.status == 200
    except Exception as exc:
        _logger.warning("notification failed: %s", exc)
        return False
    return ok


def post(url: str, msg: str, attachment: Optional[str] = None):
    """POST a Slack-style JSON notification with an optional tail of an
    attachment file (reference ``notify.post :16``)."""
    import json
    from urllib import request
    from magellanmapper_tpu.utils import libmag
    fields = {"text": msg}
    if attachment:
        lines = libmag.last_lines(attachment, 20)
        if lines:
            fields["attachments"] = [{"text": "\n".join(lines)}]
    req = request.Request(
        url, json.dumps(fields).encode("utf8"),
        {"Content-type": "application/json"})
    return request.urlopen(req)
