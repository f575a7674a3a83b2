// UdfForm - mirror of pages/UdfForm.tsx: webhook selector (pre-filled
// when navigated from webhook detail), function name with the same
// identifier validation, Python editor seeded with the same default
// snippet, multipart registration.

import { h, pageHeader, spinner, snackbar, navigate, routeState, codeEditor } from "/assets/ui.js";
import { webhookApi, udfApi } from "/assets/api.js";

const DEFAULT_UDF_CODE = `def extract_value(text: str) -> str:
    """Extract a value from text"""
    if not text:
        return None

    # Add your custom logic here
    return text.strip()`;

export async function UdfForm(main) {
  const fromWebhook = routeState().webhookId || "";
  main.append(
    pageHeader({
      title: "Create User-Defined Function",
      buttonText: "Cancel",
      buttonPath: fromWebhook ? `/webhooks/${fromWebhook}` : "/udfs",
    }),
    spinner(),
  );

  let webhooks = [];
  try {
    webhooks = await webhookApi.getAll();
  } catch {
    /* selector stays empty */
  }

  const state = { webhookId: fromWebhook, functionName: "", functionCode: DEFAULT_UDF_CODE };

  const validate = () => {
    if (!state.webhookId) return snackbar("Please select a webhook", "error"), false;
    if (!state.functionName) return snackbar("Please enter a function name", "error"), false;
    if (!/^[a-zA-Z][a-zA-Z0-9_]*$/.test(state.functionName)) {
      snackbar("Function name must start with a letter and contain only letters, numbers, and underscores", "error");
      return false;
    }
    if (!state.functionCode.trim()) return snackbar("Please enter the function code", "error"), false;
    if (!state.functionCode.includes("def ")) {
      snackbar("Function code must contain a Python function definition (def)", "error");
      return false;
    }
    return true;
  };

  const submit = async (e) => {
    e.preventDefault();
    if (!validate()) return;
    const form = new FormData();
    form.append("webhook_id", state.webhookId);
    form.append("function_name", state.functionName);
    form.append("function_code", state.functionCode);
    try {
      await udfApi.register(form);
      snackbar("UDF registered successfully", "success");
      navigate(fromWebhook ? `/webhooks/${state.webhookId}` : "/udfs");
    } catch (err) {
      snackbar(`Failed to register UDF: ${err.message}`, "error");
    }
  };

  main.lastChild.replaceWith(
    h(
      "form",
      { class: "card", onsubmit: submit },
      h("p", {}, "Create a custom Python function that can be used in your SQL queries to transform and process data."),
      h(
        "label",
        { class: "field" },
        h("span", { class: "lab" }, "Webhook *"),
        h(
          "select",
          {
            disabled: !!fromWebhook,
            onchange: (e) => (state.webhookId = e.target.value),
          },
          h("option", { value: "" }, "Select a webhook"),
          ...webhooks.map((w) =>
            h("option", { value: w.id, selected: w.id === state.webhookId }, `${w.source_path} (${w.owner ?? ""})`),
          ),
        ),
        h("div", { class: "help" }, "Select the webhook that will use this function"),
      ),
      h(
        "label",
        { class: "field" },
        h("span", { class: "lab" }, "Function Name *"),
        h("input", { type: "text", oninput: (e) => (state.functionName = e.target.value) }),
        h("div", { class: "help" }, "Name to identify this function (e.g., extract_email, format_date)"),
      ),
      h("h3", {}, "Python Function Code"),
      h("p", { class: "muted" }, "Define a Python function that takes at least one parameter and returns a value."),
      codeEditor({
        value: state.functionCode,
        height: "260px",
        language: "python",
        onChange: (v) => (state.functionCode = v),
      }),
      h(
        "div",
        { class: "right", style: "margin-top:16px" },
        h("button", { class: "btn-contained", type: "submit" }, "Register UDF"),
      ),
    ),
  );
}
