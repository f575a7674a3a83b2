// UdfList - mirror of pages/UdfList.tsx: table of UDFs with webhook
// chips, a usage-example column showing the udf_<webhook>_<name>(...)
// call form, a code preview dialog, and confirm-delete.

import {
  h, pageHeader, spinner, snackbar, navigate, dataTable, dialog,
  confirmDialog, codeEditor, fmtDate,
} from "/assets/ui.js";
import { udfApi, webhookApi } from "/assets/api.js";

export async function UdfList(main) {
  main.append(
    pageHeader({
      title: "User-Defined Functions",
      buttonText: "Create New UDF",
      buttonPath: "/udfs/new",
    }),
    spinner(),
  );

  let udfs = [], webhooks = [];
  try {
    [udfs, webhooks] = await Promise.all([
      udfApi.getAll(),
      webhookApi.getAll().catch(() => []),
    ]);
  } catch (e) {
    main.lastChild.replaceWith(
      h("p", { style: "color:var(--error)" }, `Error loading UDFs: ${e.message}`),
    );
    return;
  }

  const refetch = () => {
    main.replaceChildren();
    UdfList(main);
  };

  const webhookName = (wid) => webhooks.find((w) => w.id === wid)?.source_path || "Unknown";
  const udfName = (u) => u.name ?? u.function_name;
  const udfCode = (u) => u.code ?? u.function_code ?? "";

  const openPreview = (udf) => {
    dialog({
      title: `UDF: ${udfName(udf)}`,
      content: h(
        "div",
        {},
        h("p", { class: "muted" }, "Function code:"),
        codeEditor({ value: udfCode(udf), readOnly: true, height: "200px", language: "python" }),
        h("h3", { style: "margin-top:14px" }, "Usage in SQL:"),
        h(
          "pre",
          { class: "json" },
          `SELECT udf_${udf.webhook_id}_${udfName(udf)}(column_name) FROM table`,
        ),
      ),
      actions: (close) => [h("button", { onclick: close }, "Close")],
    });
  };

  const handleDelete = (udf) => {
    confirmDialog(
      `Are you sure you want to delete the UDF "${udfName(udf)}"? This action cannot be undone.`,
      async () => {
        try {
          await udfApi.delete(udf.id);
          snackbar("UDF deleted successfully", "success");
          refetch();
        } catch (e) {
          snackbar(`Failed to delete UDF: ${e.message}`, "error");
        }
      },
    );
  };

  const body = udfs.length
    ? dataTable({
        columns: [
          { id: "name", label: "Function Name" },
          {
            id: "webhook",
            label: "Webhook",
            format: (wid) =>
              h(
                "span",
                { class: "chip outlined clickable", onclick: () => navigate(`/webhooks/${wid}`) },
                webhookName(wid),
              ),
          },
          { id: "created_at", label: "Created At", format: fmtDate },
          {
            id: "usage",
            label: "Usage Example",
            format: (v) => h("span", { style: "font-family:monospace;font-size:13px" }, v),
          },
          {
            id: "actions",
            label: "Actions",
            align: "right",
            format: (u) =>
              h(
                "span",
                {},
                h("button", { class: "iconbtn", title: "View code", onclick: () => openPreview(u) }, "👁"),
                h("button", { class: "iconbtn error", title: "Delete UDF", onclick: () => handleDelete(u) }, "🗑"),
              ),
          },
        ],
        rows: udfs.map((u) => ({
          name: udfName(u),
          webhook: u.webhook_id,
          created_at: u.created_at,
          usage: `udf_${u.webhook_id}_${udfName(u)}(column_name)`,
          actions: u,
        })),
      })
    : h("div", { class: "card center" }, 'No User-Defined Functions found. Click "Create New UDF" to create one.');

  main.lastChild.replaceWith(body);
}
