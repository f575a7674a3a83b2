// WebhookList - mirror of pages/WebhookList.tsx: one card per webhook
// with active toggle, owner chip, view/edit/delete actions.

import { h, pageHeader, spinner, snackbar, navigate, toggleSwitch, fmtDate } from "/assets/ui.js";
import { webhookApi } from "/assets/api.js";

export async function WebhookList(main) {
  main.append(
    pageHeader({
      title: "Webhooks",
      buttonText: "Register New Webhook",
      buttonPath: "/webhooks/new",
    }),
    spinner(),
  );

  const refetch = () => {
    main.replaceChildren();
    WebhookList(main);
  };

  let webhooks;
  try {
    webhooks = await webhookApi.getAll();
  } catch (e) {
    main.lastChild.replaceWith(
      h("p", { style: "color:var(--error)" }, `Error loading webhooks: ${e.message}`),
    );
    return;
  }

  const handleToggle = async (webhook) => {
    try {
      await webhookApi.toggleStatus(webhook.id, !webhook.active);
      snackbar(`Webhook ${webhook.active ? "deactivated" : "activated"} successfully`, "success");
      refetch();
    } catch (e) {
      snackbar(`Failed to update webhook status: ${e.message}`, "error");
    }
  };

  const handleDelete = async (id) => {
    if (!window.confirm("Are you sure you want to delete this webhook?")) return;
    try {
      await webhookApi.delete(id);
      snackbar("Webhook deleted successfully", "success");
      refetch();
    } catch (e) {
      snackbar(`Failed to delete webhook: ${e.message}`, "error");
    }
  };

  const cards = webhooks.length
    ? webhooks.map((w) =>
        h(
          "div",
          { class: "card" },
          h(
            "div",
            { class: "row-between", style: "margin-bottom:10px" },
            h("h2", {}, w.source_path),
            toggleSwitch({
              checked: w.active,
              label: w.active ? "Active" : "Inactive",
              onToggle: () => handleToggle(w),
            }),
          ),
          h("div", { class: "muted" }, `Destination: ${w.destination_url}`),
          h("div", { style: "margin:6px 0" }, "Owner: ", h("span", { class: "chip" }, w.owner ?? "")),
          h("div", {}, `Created: ${fmtDate(w.created_at)}`),
          h(
            "div",
            { class: "right", style: "margin-top:10px" },
            h("button", { class: "iconbtn", title: "View details", onclick: () => navigate(`/webhooks/${w.id}`) }, "👁"),
            h("button", { class: "iconbtn", title: "Edit webhook", onclick: () => navigate(`/webhooks/${w.id}/edit`) }, "✎"),
            h("button", { class: "iconbtn error", title: "Delete webhook", onclick: () => handleDelete(w.id) }, "🗑"),
          ),
        ),
      )
    : [h("div", { class: "card center" }, 'No webhooks found. Click "Register New Webhook" to create one.')];

  main.lastChild.replaceWith(h("div", {}, ...cards));
}
