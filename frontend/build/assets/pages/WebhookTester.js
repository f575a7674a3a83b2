// WebhookTester - mirror of pages/WebhookTester.tsx: webhook selector
// with read-only path/destination fields, the same default GitHub-style
// JSON payload, send button, and result tabs (Response / Raw Payload /
// Transformed Data / Response Details) fed by /event/{id}/transformed.

import { h, pageHeader, spinner, snackbar, codeEditor } from "/assets/ui.js";
import { webhookApi, testApi } from "/assets/api.js";

const DEFAULT_PAYLOAD = `{
  "type": "PushEvent",
  "repository": {
    "id": 123456,
    "name": "webhook-gateway",
    "full_name": "user/webhook-gateway"
  },
  "sender": {
    "login": "john_doe",
    "id": 12345
  },
  "commit": {
    "id": "abcdef1234567890",
    "message": "Fix bug in login page [PROJ-123]"
  }
}`;

export async function WebhookTester(main) {
  main.append(pageHeader({ title: "Webhook Tester" }), spinner());

  let webhooks = [];
  try {
    webhooks = await webhookApi.getAll();
  } catch (e) {
    main.lastChild.replaceWith(h("div", { class: "alert error" }, `Error loading webhooks: ${e.message}`));
    return;
  }

  const state = { webhookId: "", payload: DEFAULT_PAYLOAD };
  const results = h("div");
  const detailFields = h("div", { class: "grid cols2", style: "display:none" });

  const selected = () => webhooks.find((w) => w.id === state.webhookId);

  const renderDetailFields = () => {
    const w = selected();
    if (!w) {
      detailFields.style.display = "none";
      return;
    }
    detailFields.style.display = "";
    detailFields.replaceChildren(
      h(
        "label",
        { class: "field" },
        h("span", { class: "lab" }, "Source Path"),
        h("input", { type: "text", value: w.source_path, readonly: true }),
      ),
      h(
        "label",
        { class: "field" },
        h("span", { class: "lab" }, "Destination URL"),
        h("input", { type: "text", value: w.destination_url, readonly: true }),
      ),
    );
  };

  const renderResults = (response, transformed, error) => {
    results.replaceChildren();
    if (!response && !transformed && !error) return;
    const paper = h("div", { class: "paper" }, h("h3", {}, "Test Results"));
    if (error) {
      paper.append(h("div", { class: "alert error" }, `Error: ${error}`));
    }
    if (response || transformed) {
      const tabs = [["Response", renderResponse]];
      if (transformed) tabs.push(["Raw Payload", renderRaw]);
      if (transformed?.transformed) {
        tabs.push(["Transformed Data", renderTransformed]);
        tabs.push(["Response Details", renderDetails]);
      }
      let active = 0;
      const bar = h("div", { class: "tabs" });
      const body = h("div");
      const paint = () => {
        bar.replaceChildren(
          ...tabs.map(([name], i) =>
            h(
              "div",
              {
                class: `tab ${i === active ? "active" : ""}`,
                onclick: () => {
                  active = i;
                  paint();
                },
              },
              name,
            ),
          ),
        );
        body.replaceChildren(tabs[active][1]());
      };

      function renderResponse() {
        return h(
          "div",
          {},
          h("h3", {}, "API Response"),
          h("pre", { class: "json" }, JSON.stringify(response, null, 2)),
          h("h3", { style: "margin-top:12px" }, "Event ID"),
          h("p", {}, response?.event_id || "N/A"),
        );
      }
      function renderRaw() {
        return h(
          "div",
          {},
          h("h3", {}, "Original Webhook Payload"),
          h("pre", { class: "json" }, JSON.stringify(transformed.raw_payload || {}, null, 2)),
        );
      }
      function renderTransformed() {
        return h(
          "div",
          {},
          h("h3", {}, "Transformed Payload"),
          h("p", { class: "muted" }, "This is the data after applying your SQL transformation:"),
          h("pre", { class: "json" }, JSON.stringify(transformed.transformed.payload || {}, null, 2)),
        );
      }
      function renderDetails() {
        const t = transformed.transformed;
        const item = (label, value, color) =>
          h(
            "div",
            {},
            h("h3", {}, label),
            h("p", { style: color ? `color:${color};font-weight:bold` : "" }, value),
          );
        return h(
          "div",
          { class: "grid cols2" },
          item("Destination URL", t.destination_url || "N/A"),
          item("Delivery Status", t.success ? "Success" : "Failed", t.success ? "var(--success)" : "var(--error)"),
          item("Response Code", t.response_code ?? "N/A"),
          item("Timestamp", t.timestamp || "N/A"),
          h(
            "div",
            { style: "grid-column:1/-1" },
            h("h3", {}, "Response Body"),
            h("pre", { class: "json" }, t.response_body || "N/A"),
          ),
        );
      }
      paint();
      paper.append(bar, body);
    }
    results.append(paper);
  };

  const sendBtn = h(
    "button",
    {
      class: "btn-contained",
      disabled: true,
      onclick: async () => {
        const w = selected();
        if (!w) return snackbar("Please select a webhook", "error");
        let parsed;
        try {
          parsed = JSON.parse(state.payload);
        } catch {
          return snackbar("Invalid JSON payload", "error");
        }
        sendBtn.disabled = true;
        sendBtn.textContent = "Sending...";
        try {
          const response = await testApi.sendWebhook(w.source_path, parsed);
          let transformed = null;
          if (response && response.event_id) {
            // processing is async behind the ack; poll briefly for the audit row
            for (let i = 0; i < 10 && !transformed; i++) {
              await new Promise((r) => setTimeout(r, 700));
              transformed = await testApi
                .getTransformedEvent(response.event_id)
                .then((t) => (t && t.transformed ? t : null))
                .catch(() => null);
            }
            if (!transformed) {
              transformed = await testApi.getTransformedEvent(response.event_id).catch(() => null);
            }
          }
          renderResults(response, transformed, null);
          snackbar("Webhook test successful", "success");
        } catch (e) {
          renderResults(null, null, e.message);
          snackbar("Webhook test failed", "error");
        } finally {
          sendBtn.disabled = !state.webhookId;
          sendBtn.textContent = "Send Test Webhook";
        }
      },
    },
    "Send Test Webhook",
  );

  main.lastChild.replaceWith(
    h(
      "div",
      { class: "card" },
      h("h3", {}, "Test Your Webhooks"),
      h("p", { class: "muted" }, "Send test payloads to your registered webhooks and see how they are processed."),
      h(
        "label",
        { class: "field" },
        h("span", { class: "lab" }, "Select Webhook"),
        h(
          "select",
          {
            onchange: (e) => {
              state.webhookId = e.target.value;
              sendBtn.disabled = !state.webhookId;
              renderDetailFields();
              renderResults(null, null, null);
            },
          },
          h("option", { value: "" }, "Select a webhook"),
          ...webhooks.map((w) => h("option", { value: w.id }, `${w.source_path} (${w.owner ?? ""})`)),
        ),
      ),
      detailFields,
      h("h3", {}, "JSON Payload"),
      codeEditor({
        value: state.payload,
        height: "260px",
        language: "json",
        onChange: (v) => (state.payload = v),
      }),
      h("div", { class: "right", style: "margin-top:14px" }, sendBtn),
    ),
    results,
  );
}
